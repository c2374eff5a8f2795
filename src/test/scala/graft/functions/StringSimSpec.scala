package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    StringSimKernel.jaroWinkler(UTF8String.fromString(a),
      UTF8String.fromString(b))

  test("jaroWinkler: pinned against DuckDB jaro_winkler_similarity " +
      "outputs (recorded vectors, both boost branches)") {
    // vectors recorded from duckdb 'SELECT jaro_winkler_similarity(a,b)'
    val pinned = Seq(
      ("martha", "marhta", 0.9611111111111111),   // transpositions
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("dixon", "dicksonx", 0.8133333333333332),  // boost, l=2
      ("", "abc", 0.0),
      ("", "", 0.0),                              // DuckDB's both-empty
      // odd greedy mismatch count → t FLOORS (duckdb semantics; the
      // fractional-t textbook variant would read 0.7833… here)
      ("0bab", "ba0a0b", 0.8055555555555555),
      ("Customer#000000717", "Customer#00001027", 0.9535130718954248),
      ("abqqqq", "abzzzz", 0.5555555555555555),   // j<=0.7: NO boost
      ("aq", "az", 0.6666666666666666),           // j<=0.7 boundary-ish
      ("ab", "a", 0.8500000000000001),            // boost, l=1
      ("crate", "trace", 0.7333333333333334))     // j>0.7, l=0
    pinned.foreach { case (a, b, expect) =>
      assert(jw(a, b) === expect, s"jw($a, $b)")
      assert(jw(b, a) === expect, s"symmetric jw($b, $a)")
    }
  }

  test("jaroWinkler: non-ASCII parity — UTF-8 BYTE semantics, pinned " +
      "against recorded DuckDB outputs (café/cafe is 5-vs-4 units)") {
    // vectors recorded from duckdb 1.x jaro_winkler_similarity: these
    // values are only reachable when lengths/positions are UTF-8 bytes
    // (code-point semantics would score café/cafe 0.8833…, not 0.8483…)
    val pinned = Seq(
      ("café", "cafe", 0.8483333333333334),
      ("naïve", "naive", 0.8577777777777779),
      ("straße", "strasse", 0.8857142857142858),
      ("日本語", "日本", 0.9333333333333333))
    pinned.foreach { case (a, b, expect) =>
      assert(jw(a, b) === expect, s"jw($a, $b)")
      assert(jw(b, a) === expect, s"symmetric jw($b, $a)")
    }
  }

  test("jaroWinkler: algebraic properties — identity 1, range [0,1], " +
      "prefix boost capped at l=4") {
    val rnd = new scala.util.Random(3)
    val words = (1 to 200).map(_ =>
      (1 to rnd.nextInt(10) + 1).map(_ => ('a' + rnd.nextInt(6)).toChar)
        .mkString)
    words.foreach(w => assert(jw(w, w) === 1.0))
    for (a <- words.take(40); b <- words.take(40)) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"out of range: $a $b $v")
    }
    // l caps at 4: a 10-char shared prefix boosts no more than 4 chars
    val j5 = jw("aaaaaaaaaab", "aaaaaaaaaac")
    val viaJaro = StringSimKernel.jaro(UTF8String.fromString("aaaaaaaaaab"),
      UTF8String.fromString("aaaaaaaaaac"))
    assert(j5 === viaJaro + 4 * 0.1 * (1.0 - viaJaro))
  }

  test("jaroWinkler: interpreted eval equals codegen through a real plan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 300).map { _ =>
      def w = (1 to rnd.nextInt(8) + 1)
        .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      (w, w)
    }.map { case (a, b) => if (rnd.nextBoolean()) (a, b)
      else (a, a.reverse + b.take(2)) }
    val df = pairs.toDF("a", "b")
    val viaPlan = df.select(StringSim.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val direct = pairs.map { case (a, b) => jw(a, b) }
    assert(viaPlan.toSeq === direct)
  }
}
