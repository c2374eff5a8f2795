package graft.hash

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-address hashing with the reference's exact byte semantics
  * (idb/helpers/etags.py:7-16 calcEtag, :41-79 objectHasher).
  *
  * The etag of a record is sha1 over the JSON of the flattened
  * `[k1, v1, k2, v2, ...]` array, keys sorted, serialized exactly as
  * Python's `json.dumps(arr, separators=(',',':'), ensure_ascii=False)`
  * encoded UTF-8. The driver-side pure functions here reproduce that
  * byte-for-byte (golden-tested); [[etagColumn]] is the distributed
  * variant composed purely from codegen'd built-ins.
  */
object Etags {

  /** JSON value mirror of the Python data model, so hashing semantics
    * (int vs float repr, None, nesting) can be matched exactly. */
  sealed trait V
  object V {
    final case class S(v: String)            extends V
    final case class I(v: Long)              extends V
    final case class F(v: Double)            extends V
    final case class B(v: Boolean)           extends V
    case object Null                         extends V
    final case class L(v: Seq[V])            extends V
    /** insertion-ordered, like a Python dict */
    final case class O(v: Seq[(String, V)])  extends V
  }

  /** Python `sorted()` on str compares by code point; Java's compareTo
    * compares UTF-16 units, which misorders astral-plane keys. */
  private[hash] val pyStringOrdering: Ordering[String] = (a: String, b: String) => {
    val ai = a.codePoints().iterator(); val bi = b.codePoints().iterator()
    var r = 0
    while (r == 0 && ai.hasNext && bi.hasNext) r = Integer.compare(ai.next(), bi.next())
    if (r != 0) r else java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
  }

  /** String escape identical to Python json.dumps(ensure_ascii=False). */
  private[hash] def pyJsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Python float repr for the common range. Shortest-round-trip digits
    * match CPython for |x| in [1e-4, 1e16); outside that CPython switches
    * to exponent notation at different thresholds than Java — record
    * fields are strings in practice, so this is documented, not handled. */
  private def pyFloatRepr(d: Double): String = {
    if (d == d.toLong && math.abs(d) < 1e16) s"${d.toLong}.0"
    else {
      val s = java.lang.Double.toString(d)
      if (s.contains("E")) {
        // 1.0E20 → 1e+20 / 1.0E-7 → 1e-07 (best effort outside core range)
        val Array(m, e) = s.split("E")
        val mant = if (m.endsWith(".0")) m.dropRight(2) else m
        val exp = e.toInt
        f"${mant}e${if (exp < 0) "-" else "+"}${math.abs(exp)}%02d"
      } else s
    }
  }

  /** Serialize exactly like json.dumps(v, separators=(',',':'),
    * ensure_ascii=False). Object keys are NOT re-sorted (Python dict
    * iteration order); calcEtag sorts only the top level. */
  def pyJson(v: V): String = v match {
    case V.S(s)    => "\"" + pyJsonEscape(s) + "\""
    case V.I(i)    => i.toString
    case V.F(d)    => pyFloatRepr(d)
    case V.B(b)    => if (b) "true" else "false"
    case V.Null    => "null"
    case V.L(xs)   => xs.map(pyJson).mkString("[", ",", "]")
    case V.O(kvs)  => kvs.map { case (k, x) => "\"" + pyJsonEscape(k) + "\":" + pyJson(x) }
      .mkString("{", ",", "}")
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private def digest(algo: String, s: String): String =
    hex(MessageDigest.getInstance(algo).digest(s.getBytes("UTF-8")))

  /** calcEtag (etags.py:7-16): sha1 of the sorted flattened kv array. */
  def calcEtag(data: Seq[(String, V)]): String = {
    val arr = data.sortBy(_._1)(pyStringOrdering)
      .flatMap { case (k, v) => Seq(V.S(k), v) }
    digest("SHA-1", pyJson(V.L(arr)))
  }

  /** Convenience for all-string records (the dominant case). */
  def calcEtag(data: Map[String, String]): String =
    calcEtag(data.toSeq.map { case (k, v) =>
      k -> (if (v == null) (V.Null: V) else V.S(v)) })

  /** objectHasher (etags.py:41-79): recursive hash where lists hash the
    * concatenation of child *hashes* and dicts hash `key + childHash`
    * pairs. Used for correction keys and download query-hash dedup.
    * hashType: "sha1" | "md5" | "sha256". */
  def objectHasher(hashType: String, data: V,
      sortArrays: Boolean = false, sortKeys: Boolean = true): String = {
    val algo = hashType match {
      case "sha1" => "SHA-1"; case "md5" => "MD5"; case "sha256" => "SHA-256"
      case other  => throw new IllegalArgumentException(s"unsupported hash: $other")
    }
    def go(v: V): String = {
      val s = v match {
        case V.L(xs) =>
          val sa = xs.map(go)
          (if (sortArrays) sa.sorted else sa).mkString
        case V.S(x)   => x
        case V.B(b)   => if (b) "True" else "False" // python str(bool)
        case V.I(i)   => i.toString
        case V.F(d)   => pyFloatRepr(d)
        case V.O(kvs) =>
          val ks = if (sortKeys) kvs.sortBy(_._1)(pyStringOrdering) else kvs
          ks.map { case (k, x) => k + go(x) }.mkString
        case V.Null   => ""
      }
      digest(algo, s)
    }
    go(data)
  }

  // --- distributed variant ---------------------------------------------

  private def pyEscapeCol(c: Column): Column =
    Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n",
        "\r" -> "\\r", "\t" -> "\\t", "\b" -> "\\b", "\f" -> "\\f")
      .foldLeft(c) { case (acc, (from, to)) =>
        call_function("replace", acc, lit(from), lit(to))
      }

  private def quoted(c: Column): Column =
    when(c.isNull, lit("null"))
      .otherwise(concat(lit("\""), pyEscapeCol(c), lit("\"")))

  /** The flattened sorted-kv JSON text for a `map<string,string>` column
    * — byte-identical to [[calcEtag]]'s serialization for values without
    * sub-0x20 control chars other than \n \r \t \b \f (strip_nuls runs
    * upstream in the reference too, db_check.py:170-179). Exposed so the
    * DuckDB oracle can build the identical string in SQL. */
  def etagJsonColumn(m: Column): Column = {
    val entries = array_sort(map_entries(m)) // struct sort = key-first
    concat(lit("["),
      array_join(transform(entries,
        e => concat(quoted(e.getField("key")), lit(","),
                    quoted(e.getField("value")))), ","),
      lit("]"))
  }

  /** Distributed calcEtag over a `map<string,string>` column. Pure
    * built-ins (map_entries/array_sort/transform/replace/sha1) — stays
    * inside WholeStageCodegen, no UDF. */
  def etagColumn(m: Column): Column = sha1(etagJsonColumn(m))

  /** Same serialization, md5 — for oracles in engines without sha1. */
  def etagColumnMd5(m: Column): Column = md5(etagJsonColumn(m))
}
