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
      org.apache.spark.sql.types.LongType) {

  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.catalyst.InternalRow

  private var stats: Map[Long, (Long, Long)] = Map.empty
  // the admission log: one materialized cut per committed batch. The
  // STATS store is bounded; the LOG is not — it grows with ingested
  // volume (each batch's (id, weight, batch_id) rows stay pinned in
  // block storage), which is why consumers that have drained a prefix
  // must release it via [[releaseScored]]. A caller that only needs
  // the stats store should release after every drain.
  private var log: Vector[(Long, DataFrame, RDD[InternalRow])] = Vector.empty
  private var lastBatchId: Long = Long.MinValue

  /** The foreachBatch sink: `stream.writeStream.foreachBatch(
    * maintainer.processBatch _)`. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= lastBatchId) return
    // 1. the batch's own sufficient statistics — a bounded collect
    //    (≤ buckets rows by construction)
    val bStats = Corpus.dsirStats(batch, textCol, isTarget, buckets)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val merged = bStats.foldLeft(stats) { case (m, (b, (cr, ct))) =>
      val (ocr, oct) = m.getOrElse(b, (0L, 0L))
      m.updated(b, (ocr + cr, oct + ct))
    }
    // 2.+3. score the batch against the stats so far (its own
    //    included) and materialize the cut — the commit point: only
    //    after the cut exists do the store refs advance (a failed cut
    //    unwinds itself and leaves the maintainer replayable). The
    //    pinScope releases the transient stats-table cut
    //    dsirWeightsFromStats registers, so a long stream parks no
    //    dead per-batch blocks in the session registry.
    val (cutDf, rdd) = graft.Staging.pinScope {
      graft.operators.Graph.localCut(
        Corpus.dsirWeightsFromStats(batch, idCol, textCol,
            statsDf(merged), buckets)
          .withColumn("batch_id", lit(batchId)))
    }
    log :+= ((batchId, cutDf, rdd))
    stats = merged
    lastBatchId = batchId
  }

  /** Release the admission-log entries of batches `<= upToBatchId`
    * (their blocks unpersist; [[scored]] no longer returns them). The
    * STATS store is untouched — replay protection and future scoring
    * never depend on the log, so a consumer drains the log and
    * releases exactly like committing a sink offset. */
  def releaseScored(upToBatchId: Long): Unit = synchronized {
    val (drop, keep) = log.partition(_._1 <= upToBatchId)
    drop.foreach(_._3.unpersist(blocking = false))
    log = keep
  }

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
    log.map(_._2).reduceLeftOption(_ unionByName _)
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
