package graft.hash

import org.scalatest.funsuite.AnyFunSuite

/** Differential audit of content-address hashing against the
  * reference (idb/helpers/etags.py, run directly by
  * tools/gen_etags_differential.py): 4,500 structured-random records
  * across three seeds (the third added round 12, first-run pass) —
  * nested values, control characters, quotes/backslashes, BMP and
  * ASTRAL-plane unicode in both keys and values (the code-point-vs-
  * UTF-16 key-sort trap), bools-as-ints, production-range floats —
  * replayed through Etags.calcEtag and all three objectHasher modes.
  * Pure-JVM. */
class EtagsDifferentialSpec extends AnyFunSuite {
  import Etags.V

  /** Minimal recursive-descent JSON parser for the ensure_ascii vector
    * file, producing the V ADT with insertion-ordered objects (the
    * property sort_keys=False depends on). */
  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i) <= ' ') i += 1
    def value(): V = { ws(); s.charAt(i) match {
      case '{' => obj()
      case '[' => arr()
      case '"' => V.S(str())
      case 't' => i += 4; V.B(true)
      case 'f' => i += 5; V.B(false)
      case 'n' => i += 4; V.Null
      case _   => num()
    }}
    private def obj(): V = {
      i += 1; ws()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, V)]
      if (s.charAt(i) == '}') { i += 1; return V.O(buf.toSeq) }
      while (true) {
        ws(); val k = str(); ws()
        require(s.charAt(i) == ':'); i += 1
        buf += (k -> value()); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return V.O(buf.toSeq)
        }
      }
      V.O(buf.toSeq)
    }
    private def arr(): V = {
      i += 1; ws()
      val buf = scala.collection.mutable.ArrayBuffer.empty[V]
      if (s.charAt(i) == ']') { i += 1; return V.L(buf.toSeq) }
      while (true) {
        buf += value(); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return V.L(buf.toSeq)
        }
      }
      V.L(buf.toSeq)
    }
    private def str(): String = {
      require(s.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          s.charAt(i + 1) match {
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case o   => sb.append(o); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
    private def num(): V = {
      val start = i
      while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) V.F(t.toDouble)
      else V.I(t.toLong)
    }
  }

  private lazy val vectors: Seq[Map[String, V]] =
    // vectors3: third unseen seed (31337), added round 12 — passed on
    // its first run
    Seq("/etags_vectors.jsonl", "/etags_vectors2.jsonl",
        "/etags_vectors3.jsonl").flatMap { res =>
      val url = getClass.getResource(res)
      val src = scala.io.Source.fromURL(url)(scala.io.Codec.UTF8)
      try src.getLines().map { l =>
        new P(l).value() match {
          case V.O(kvs) => kvs.toMap
          case other    => fail(s"bad vector line: $other")
        }
      }.toList
      finally src.close()
    }

  private def strOf(v: V): String = v match {
    case V.S(x) => x
    case other  => fail(s"expected string, got $other")
  }

  test("calcEtag agrees with 4500 recorded reference runs (three seeds)") {
    assert(vectors.size === 4500)
    val bad = vectors.flatMap { v =>
      val V.O(kvs) = v("data"): @unchecked
      val got = Etags.calcEtag(kvs)
      if (got != strOf(v("etag"))) Some((v("id"), got)) else None
    }
    assert(bad.isEmpty, s"${bad.size} mismatches: ${bad.take(5)}")
  }

  test("objectHasher agrees in all three modes (sha256, sort_arrays, " +
      "md5 sort_keys=False)") {
    val bad = vectors.flatMap { v =>
      val data = v("data")
      val trio = (
        Etags.objectHasher("sha256", data),
        Etags.objectHasher("sha256", data, sortArrays = true),
        Etags.objectHasher("md5", data, sortKeys = false))
      val exp = (strOf(v("oh")), strOf(v("oh_sa")), strOf(v("oh_nk")))
      if (trio != exp) Some((v("id"), trio, exp)) else None
    }
    assert(bad.isEmpty, s"${bad.size} mismatches: ${bad.take(3)}")
  }
}
