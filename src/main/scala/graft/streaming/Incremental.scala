package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Incremental / continuous indexing (SURVEY §2.10), the Spark
  * re-expression of idb/indexing/index_from_postgres.py.
  *
  *  - batch incremental: watermark = max(datemodified) of the indexed
  *    table; pull log rows `modified > watermark` (ALL versions, in
  *    ascending order — :93-97) and fold to latest per uuid;
  *  - resume: full reconciliation of store-latest vs indexed state by
  *    etag diff (:167-222) — a full-outer join, not an id cache in one
  *    process's heap;
  *  - delete propagation: tombstoned uuids become delete actions
  *    (:287-309);
  *  - continuous: Structured Streaming over the append-only version log
  *    with an event-time watermark standing in for the sleep loop
  *    (:365-376).
  */
object Incremental {

  /** ES max-datemodified watermark (index_from_postgres.py:71-89). The
    * reference ceils to the next second to avoid equal-timestamp loss
    * (:88-89); with exact timestamps we keep strict `>`. */
  def watermark(indexed: DataFrame, modifiedCol: String = "modified"): Column =
    max(col(modifiedCol))

  /** The incremental pull: every version newer than the watermark,
    * reduced to the latest per uuid within the batch (SURVEY §7.4.6 —
    * version-by-version replay is pointless when the sink keeps only
    * the latest; `max_by` keeps it one partial-aggregable pass). */
  def incrementalBatch(log: DataFrame, watermarkValue: Column): DataFrame =
    log.filter(col("modified") > watermarkValue)
      .groupBy(col("uuids_id"))
      .agg(max(struct(col("modified"), col("version"), col("data_etag"))).as("top"))
      .select(col("uuids_id"),
        col("top.data_etag").as("etag"),
        col("top.version").as("version"),
        col("top.modified").as("modified"))

  /** Resume reconciliation (index_from_postgres.py:188-222): compare the
    * store's latest state against the indexed table's (uuid → etag) and
    * classify every uuid:
    *  - "index": missing from the index or etag differs;
    *  - "delete": indexed but gone (or tombstoned) in the store;
    *  - "skip": etags match.
    * One full-outer shuffle join on uuid — at 100 TB both sides bucket
    * by uuid so this co-locates without a shuffle at all. */
  def resumeActions(storeLatest: DataFrame, indexed: DataFrame): DataFrame = {
    val s = storeLatest.select(col("uuids_id").as("uuid"),
      col("etag").as("store_etag"),
      coalesce(col("deleted"), lit(false)).as("deleted"))
    val i = indexed.select(col("uuid"), col("etag").as("index_etag"))
    s.join(i, Seq("uuid"), "full_outer")
      .select(col("uuid"),
        when(col("store_etag").isNull || col("deleted"), "delete")
          .when(col("index_etag").isNull, "index")
          .when(col("store_etag") =!= col("index_etag"), "index")
          .otherwise("skip").as("action"))
  }

  /** Delete propagation (index_from_postgres.py:287-309). */
  def deletes(uuids: DataFrame): DataFrame =
    uuids.filter(col("deleted")).select(col("uuid"))

  /** Continuous incremental as Structured Streaming: the version log is
    * the stream; late versions are bounded by `lateness`; each
    * micro-batch upserts latest-per-uuid into the indexed table via the
    * caller's merge function (foreachBatch = the MERGE sink). */
  def continuous(logStream: DataFrame, lateness: String,
      checkpoint: String, trigger: Trigger)(
      merge: (DataFrame, Long) => Unit): StreamingQuery =
    logStream
      .withWatermark("modified", lateness)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // fold the micro-batch to latest-per-uuid before merging
        val latest = batch
          .groupBy(col("uuids_id"))
          .agg(max(struct(col("modified"), col("version"), col("data_etag"))).as("top"))
          .select(col("uuids_id"), col("top.data_etag").as("etag"),
            col("top.version").as("version"), col("top.modified").as("modified"))
        merge(latest, id)
      }
      .start()
}
