package graft.queries

import graft.Tables
import graft.export.Exports
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export-sink semantics as CORRECTNESS queries (download.py:166-225). */
object ExportQueries {

  /** uniquevals: value → count sorted by count desc (most_common), with
    * the scientificname capitalization rule exercised on a derived name
    * column. The uuid5 id column is covered by ScalaTest goldens (DuckDB
    * has no sha1 to mirror it). */
  def qUniquevals(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("scientificname",
        concat(lit("GENUS"), col("doc_id") % 7, lit(" epithet")))
    Exports.uniquevals(d, "records", "scientificname", identity)
      .drop("id")
  }

  val qUniquevalsSql: String =
    """WITH d AS (SELECT 'Genus' || (doc_id % 7) || ' epithet' AS value
      |           FROM documents)
      |SELECT value, COUNT(*) AS itemCount FROM d
      |GROUP BY value ORDER BY itemCount DESC, value""".stripMargin

  /** query_to_csv value encoding: id first, arrays JSON-encoded, nulls
    * as empty string, headers renamed to `namespace:term` long names. */
  def qExportCsv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val recs = ev.groupBy(concat(lit("u"), col("user_id")).as("uuid"))
      .agg(
        sort_array(collect_list(concat(lit("ev:"), col("event_id")))).as("recordids"),
        max(when(col("event_type") === "click", col("props"))).as("locality"))
    Exports.csvFormat(recs, "records", "uuid", Seq("recordids", "locality"))
      .orderBy(col("uuid"))
  }

  val qExportCsvSql: String =
    """WITH recs AS (
      |  SELECT 'u' || user_id AS uuid,
      |    list_sort(list('ev:' || event_id)) AS recordids,
      |    max(CASE WHEN event_type = 'click' THEN props END) AS locality
      |  FROM events GROUP BY 1)
      |SELECT uuid,
      |  coalesce(to_json(recordids), '') AS "idigbio:recordIds",
      |  coalesce(locality, '') AS "dwc:locality"
      |FROM recs ORDER BY uuid""".stripMargin

  /** Citation attribution counts (download.py:49-79). */
  def qCitations(s: SparkSession, dir: String): DataFrame =
    Exports.citationCounts(Tables.documents(s, dir), "source")

  val qCitationsSql: String =
    """SELECT source AS recordset, COUNT(*) AS itemCount FROM documents
      |GROUP BY source ORDER BY itemCount DESC, recordset""".stripMargin
}
