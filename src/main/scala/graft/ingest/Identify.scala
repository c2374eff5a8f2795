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

  /** mungeid (db_check.py:60-61): strip the characters the reference's
    * bad_char_re removes (non-printables + NULs), trim. */
  def mungeId(c: Column): Column =
    trim(regexp_replace(c, "[\\x00-\\x1f\\x7f]", ""))

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
