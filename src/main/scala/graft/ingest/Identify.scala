package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-rowtype identifier extraction (identifyRecord,
  * idigbio_ingestion/db_check.py:60-165): candidate external ids for
  * each incoming record, in the reference's priority order, as pure
  * column expressions. Candidates feed the identity-resolution join
  * (IngestQueries.qIngestIdentity).
  */
object Identify {

  /** Python str.strip()'s exact whitespace set (chars where
    * `c.isspace()` is true) — WIDER than Java's `\s` and than
    * Character.isWhitespace: includes the \x1c-\x1f separators, NEL,
    * NBSP, NNBSP and the Unicode space block. Pinned by the
    * identify differential (tools/gen_identify_differential.py). */
  private val PyWs =
    "\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A" +
      "\\u2028\\u2029\\u202F\\u205F\\u3000"

  /** mungeid (db_check.py:44-45,60-61): the reference's bad_char_re is
    * ONLY U+FEFF (BOM) — other control characters survive — followed by
    * Python `.strip()` (full Unicode whitespace, both ends). */
  def mungeId(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\uFEFF", ""),
      s"^[$PyWs]+|[$PyWs]+$$", "")

  /** Extension rowtype → ingestion type (db_check.py:89-95). */
  val ingestionTypes: Map[String, String] = Map(
    "dwc:Occurrence" -> "records",
    "dwc:Multimedia" -> "mediarecords",
    "dcterms" -> "mediarecords",
    "records" -> "records",
    "mediarecords" -> "mediarecords")

  /** Candidate identifiers for one record, ordered by the reference's
    * priority list (db_check.py:64-87). Each element is a struct
    * (field, id); nulls are compacted out. `rsid` is the recordset
    * prefix used by the `rs\id` composed forms. The "UConn exception"
    * (db_check.py:155-161) suppresses ac:providerManagedID when it
    * equals dcterms:identifier case-insensitively. */
  def candidates(data: Column, rowType: String, rsid: Column): Column = {
    def f(name: String): Column = element_at(data, name)
    def raw(name: String): Column =
      when(f(name).isNotNull,
        struct(lit(name).as("field"), lower(mungeId(f(name))).as("id")))
    def prefixed(name: String, sep: String): Column =
      when(f(name).isNotNull,
        struct(lit(name).as("field"),
          lower(concat(rsid, lit(sep), mungeId(f(name)))).as("id")))
    val uconnSuppressed =
      when(f("ac:providerManagedID").isNotNull &&
          f("dcterms:identifier").isNotNull &&
          lower(f("dcterms:identifier")) === lower(f("ac:providerManagedID")),
        lit(null))
        .otherwise(raw("ac:providerManagedID"))

    val entries: Seq[Column] = ingestionTypes.getOrElse(rowType, rowType) match {
      case "records" => Seq(
        raw("idigbio:recordId"),
        raw("idigbio:recordID"),
        prefixed("dwc:occurrenceID", "\\"),
        prefixed("id", "\\"),
        prefixed("ID", "\\"))
      case "mediarecords" => Seq(
        raw("idigbio:recordId"),
        raw("idigbio:recordID"),
        uconnSuppressed,
        prefixed("dcterms:identifier", "\\media\\"))
      case _ => Seq.empty
    }
    if (entries.isEmpty) array().cast("array<struct<field:string,id:string>>")
    else concat(entries.map(e =>
      when(e.isNotNull, array(e))
        .otherwise(array().cast("array<struct<field:string,id:string>>"))): _*)
  }
}
