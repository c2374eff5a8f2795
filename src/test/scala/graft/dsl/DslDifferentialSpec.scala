package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized compound-DSL differential: 300 random (two seeds) Query Format JSONs
  * (term/terms/prefix/range/exists/missing over distinct fields,
  * implicit AND — tools/gen_dsl_differential.py) whose expected
  * o_orderkey sets were computed by DuckDB from per-predicate SQL
  * templates independent of this compiler. Each DSL goes through the
  * REAL Query.parse → Compile path against the sf0.001 orders table —
  * the compound-interaction coverage the single-predicate driver
  * queries don't reach. */
class DslDifferentialSpec extends SparkSpec {

  test("compile agrees with 300 recorded compound-DSL result sets") {
    runDifferential("/dsl_vectors.jsonl", expected = 300)
  }

  test("compile agrees with 200 fresh-seed compound-DSL result sets " +
      "(seed 777, added round 12 — passed on its first run)") {
    runDifferential("/dsl_vectors2.jsonl", expected = 200)
  }

  private def runDifferential(resource: String, expected: Int): Unit = {
    val url = getClass.getResource(resource)
    val src = scala.io.Source.fromURL(url)(scala.io.Codec.UTF8)
    val vectors = try {
      src.getLines().map { l =>
        val id = """"id": (\d+)""".r.findFirstMatchIn(l).get.group(1).toLong
        val dsl = {
          val m = """"dsl": "((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(l).get.group(1)
          m.replace("\\\"", "\"").replace("\\\\", "\\")
        }
        val expect = """"expect": \[([^\]]*)\]""".r.findFirstMatchIn(l).get.group(1)
          .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
        (id, dsl, expect)
      }.toList
    } finally src.close()
    assert(vectors.size === expected)
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      .cache()
    try {
      val bad = vectors.flatMap { case (id, dsl, expect) =>
        val got = orders.filter(Compile.fromJson(dsl))
          .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
        if (got != expect) Some((id, dsl, expect.take(5), got.take(5))) else None
      }
      assert(bad.isEmpty, s"${bad.size} mismatches: ${bad.take(3)}")
    } finally orders.unpersist()
  }
}
