package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** The STREAMING twin of the incremental DSIR gate (q_dsir_incr): a
  * `foreachBatch` importance-weight maintainer with score-at-admission
  * semantics — each arriving micro-batch is scored with the importance
  * weight a production ingest attaches to a document the moment it
  * lands, using the target-vs-corpus distribution observed SO FAR.
  *
  * Store shape: the maintainer's DECISION state is the per-bucket
  * sufficient-statistics table — (raw token count, target token count)
  * per hash bucket — which is BOUNDED AT `buckets` ENTRIES BY
  * CONSTRUCTION: like the PQ codebook, this is the rare driver-side
  * state a 100 TB corpus cannot grow, so it lives as a plain map and
  * merges by exact integer addition. The scored ADMISSION LOG, by
  * contrast, grows with ingested volume; consumers drain it and
  * release the drained prefix ([[releaseScored]]) exactly like
  * committing a sink offset — replay protection and future scoring
  * depend only on the bounded stats store. Per batch the distributed work is
  * one token-stream aggregate of THE BATCH (map-side-combined to
  * ≤ `buckets` rows) and one codegen'd scoring scan of the batch
  * against the merged llr array ([[Corpus.dsirWeightsFromStats]]) —
  * the store is never re-tokenized, no (doc × bucket) table forms.
  *
  * Contracts (StreamingDsirSpec pins all three):
  *  - STATS EXACTNESS, ORDER-FREE: after any batch split, in any
  *    arrival order, the store equals the one-shot [[Corpus.dsirStats]]
  *    of the union — counts are exact mergeable sufficient statistics
  *    (the q_dsir_incr argument), so there is no approximation drift
  *    to bound.
  *  - SCORE-AT-ADMISSION: each batch's emitted weights equal
  *    [[Corpus.dsirWeightsFromStats]] of that batch against the
  *    stats-so-far (including the batch's own) — deterministic in the
  *    stream prefix. Weights scored early legitimately differ from a
  *    final-distribution re-score as more data arrives; that is the
  *    inherent streaming-vs-batch trade, stated rather than hidden,
  *    and re-scoring any corpus against the FINAL store reproduces
  *    the batch gate bit-for-bit.
  *  - AT-LEAST-ONCE REPLAY: a batchId at or below the last committed
  *    one is skipped (its counts are already merged — re-merging
  *    would double them); a batch that FAILS mid-flight leaves the
  *    store, the scored log, and `lastBatchId` untouched, so the
  *    replay re-runs it cleanly (state swaps happen only after the
  *    batch's lineage cut has fully materialized — the
  *    [[StreamingPipeline]] commit-point ordering).
  */
class StreamingDsir(spark: SparkSession, idCol: String, textCol: String,
    isTarget: Column, buckets: Int,
    idType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType)
    extends AdmissionLogMaintainer {

  private var stats: Map[Long, (Long, Long)] = Map.empty

  /** The foreachBatch sink: `stream.writeStream.foreachBatch(
    * maintainer.processBatch _)`. The commit-point protocol (replay
    * guard, cut-then-swap ordering, log lifecycle) lives in
    * [[AdmissionLogMaintainer]]. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    withPersisted(batch) { b =>
      // 1. the batch's own sufficient statistics — a bounded collect
      //    (≤ buckets rows by construction)
      val bStats = Corpus.dsirStats(b, textCol, isTarget, buckets)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      val merged = bStats.foldLeft(stats) { case (m, (bk, (cr, ct))) =>
        val (ocr, oct) = m.getOrElse(bk, (0L, 0L))
        m.updated(bk, (ocr + cr, oct + ct))
      }
      // 2. score the batch against the stats so far (its own
      //    included). No pinScope: the stats table here is a
      //    driver-local leaf, so dsirWeightsFromStats skips its
      //    transient cut and registers nothing to release.
      commit(batchId) {
        Corpus.dsirWeightsFromStats(b, idCol, textCol,
            statsDf(merged), buckets)
          .withColumn("batch_id", lit(batchId))
      } {
        stats = merged
      }
    }
  }

  /** Release the admission-log entries of batches `<= upToBatchId`
    * (their blocks unpersist; [[scored]] no longer returns them). The
    * STATS store is untouched — replay protection and future scoring
    * never depend on the log, so a consumer drains the log and
    * releases exactly like committing a sink offset. */
  def releaseScored(upToBatchId: Long): Unit = releaseLog(upToBatchId)

  private def statsDf(m: Map[Long, (Long, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    m.toSeq.map { case (b, (cr, ct)) => (b, cr, ct) }
      .toDF("_b", "_cr", "_ct")
  }

  /** The maintained sufficient statistics (bucket → (raw, target)). */
  def statsStore: Map[Long, (Long, Long)] = synchronized(stats)

  /** The maintained statistics as the DataFrame slice
    * [[Corpus.dsirWeightsFromStats]] consumes — re-score any corpus
    * against the CURRENT store with it. */
  def statsTable: DataFrame = synchronized(statsDf(stats))

  /** The (id, weight_nano, batch_id) admission log of every committed,
    * not-yet-[[releaseScored released]] batch. The empty-log frame
    * types the id column as `idType` (a constructor default of
    * LongType) so it unions cleanly with the scored schema. */
  def scored: DataFrame = synchronized {
    logFrames.reduceLeftOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol, idType),
          org.apache.spark.sql.types.StructField("weight_nano",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("batch_id",
            org.apache.spark.sql.types.LongType, nullable = false)))))
  }
}
