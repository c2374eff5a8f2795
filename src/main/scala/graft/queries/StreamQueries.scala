package graft.queries

import graft.Tables
import graft.streaming.Incremental
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-indexing semantics as CORRECTNESS queries over the
  * events-derived version log (same model as StoreQueries). */
object StreamQueries {

  /** Incremental batch after a watermark: everything modified after
    * 2024-01-03 reduced to latest-per-uuid (index_from_postgres.py
    * :68-164 + batch fold). The watermark is itself computed from the
    * "already indexed" portion, as the reference does against ES. */
  def qIncremental(s: SparkSession, dir: String): DataFrame = {
    val log = StoreQueries.storeFrom(s, dir).uuidsData
    val indexed = log.filter(to_date(col("modified")) <= "2024-01-03")
    val wm = indexed.agg(Incremental.watermark(indexed).as("wm"))
    Incremental.incrementalBatch(log.crossJoin(wm), col("wm"))
      .orderBy(col("uuids_id"))
  }

  val qIncrementalSql: String =
    """WITH vlog AS (SELECT 'u' || user_id AS uuids_id, md5(props) AS data_etag,
      |    ts AS modified,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) - 1 AS BIGINT) AS version
      |  FROM events),
      |wm AS (SELECT max(modified) AS wm FROM vlog
      |       WHERE CAST(modified AS DATE) <= DATE '2024-01-03'),
      |fresh AS (SELECT * FROM vlog, wm WHERE modified > wm)
      |SELECT uuids_id, data_etag AS etag, version, modified FROM (
      |  SELECT *, row_number() OVER (PARTITION BY uuids_id
      |    ORDER BY modified DESC, version DESC) AS rn FROM fresh)
      |WHERE rn = 1 ORDER BY uuids_id""".stripMargin

  /** Resume reconciliation (index_from_postgres.py:188-222): the
    * "indexed" state is the store as of Jan 3; classify each uuid as
    * index / delete / skip against the full store. */
  def qResumeActions(s: SparkSession, dir: String): DataFrame = {
    val st = StoreQueries.storeFrom(s, dir)
    val latest = st.latestVersions
      .join(st.uuids.withColumnRenamed("uuid", "uuids_id")
        .select(col("uuids_id"), col("deleted")), Seq("uuids_id"), "left")
    val indexedState = Incremental.incrementalBatch(
        st.uuidsData.filter(to_date(col("modified")) <= "2024-01-03"),
        to_timestamp(lit("1900-01-01")))
      .select(col("uuids_id").as("uuid"), col("etag"))
    Incremental.resumeActions(latest, indexedState)
      .orderBy(col("uuid"))
  }

  val qResumeActionsSql: String =
    """WITH vlog AS (SELECT 'u' || user_id AS uuids_id, md5(props) AS data_etag,
      |    ts AS modified, event_id,
      |    (user_id % 97 = 0) AS deleted
      |  FROM events),
      |latest AS (SELECT uuids_id, data_etag, deleted FROM (
      |  SELECT *, row_number() OVER (PARTITION BY uuids_id
      |    ORDER BY modified DESC, event_id DESC) AS rn FROM vlog) WHERE rn = 1),
      |indexed AS (SELECT uuids_id, data_etag FROM (
      |  SELECT *, row_number() OVER (PARTITION BY uuids_id
      |    ORDER BY modified DESC, event_id DESC) AS rn FROM vlog
      |  WHERE CAST(modified AS DATE) <= DATE '2024-01-03') WHERE rn = 1)
      |SELECT coalesce(l.uuids_id, i.uuids_id) AS uuid,
      |  CASE WHEN l.uuids_id IS NULL OR l.deleted THEN 'delete'
      |       WHEN i.uuids_id IS NULL THEN 'index'
      |       WHEN l.data_etag != i.data_etag THEN 'index'
      |       ELSE 'skip' END AS action
      |FROM latest l FULL OUTER JOIN indexed i ON l.uuids_id = i.uuids_id
      |ORDER BY uuid""".stripMargin
}
