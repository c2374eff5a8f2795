package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** The STREAMING twin of the temperature-remix gate
  * (q_temperature_remix): a `foreachBatch` mixture maintainer with
  * replicate-at-admission semantics — each arriving micro-batch is
  * up-/down-sampled with the α-temperature weights of the source
  * distribution observed SO FAR, the shape a continuous training-data
  * feed uses to keep its emitted mixture near-uniform while sources
  * arrive at wildly different rates.
  *
  * Store shape: the decision state is the per-source document count —
  * BOUNDED AT THE NUMBER OF SOURCES (a domain-sized map, like the
  * DSIR bucket table), merged by exact integer addition. Per batch
  * the distributed work is one groups-sized count of THE BATCH and
  * the broadcast-weight remix draw over the batch
  * ([[Corpus.remixByWeights]]); the emitted log grows with ingested
  * volume and is released by drained consumers ([[releaseEmitted]]).
  *
  * Contracts (StreamingMixtureSpec):
  *  - COUNT EXACTNESS, ORDER-FREE: after any batch split, in any
  *    arrival order, the count store equals the one-shot per-source
  *    counts of the union — sizes are exact sufficient statistics, so
  *    [[Corpus.temperatureWeightsFromSizes]] of the final store is
  *    bit-identical to the batch [[Corpus.temperatureWeights]].
  *  - REPLICATE-AT-ADMISSION: each batch's emitted mixture equals
  *    [[Corpus.remixByWeights]] of that batch under the weights of
  *    the stats-so-far (its own counts included) — deterministic in
  *    the stream prefix. Early batches legitimately replicate under
  *    early weights (the streaming-vs-batch trade, stated).
  *  - AT-LEAST-ONCE REPLAY: committed batchIds are skipped; a batch
  *    that fails mid-flight leaves store, log, and `lastBatchId`
  *    untouched (state advances only after the batch's cut
  *    materializes — the [[StreamingPipeline]] commit-point
  *    ordering).
  */
class StreamingMixture(spark: SparkSession, idCol: String,
    keyCol: String, alpha: Double) extends AdmissionLogMaintainer {

  private var counts: Map[String, Long] = Map.empty

  /** The foreachBatch sink: `stream.writeStream.foreachBatch(
    * maintainer.processBatch _)`. The commit-point protocol (replay
    * guard, cut-then-swap ordering, log lifecycle) lives in
    * [[AdmissionLogMaintainer]]. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    require(batch.schema(keyCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"StreamingMixture keys on a string column; $keyCol is " +
        batch.schema(keyCol).dataType.catalogString)
    withPersisted(batch) { b =>
      // 1. the batch's own per-source counts — a bounded collect
      //    (domain-sized: one row per source present in the batch)
      val bCounts = b.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val merged = bCounts.foldLeft(counts) { case (m, (k, n)) =>
        m.updated(k, m.getOrElse(k, 0L) + n)
      }
      // 2. replicate the batch under the weights of the counts so far
      commit(batchId) {
        Corpus.remixByWeights(b,
            Corpus.temperatureWeightsFromSizes(
              sizesDf(merged), keyCol, alpha),
            keyCol, idCol)
          .withColumn("batch_id", lit(batchId))
      } {
        counts = merged
      }
    }
  }

  private def sizesDf(m: Map[String, Long]): DataFrame = {
    val sp = spark
    import sp.implicits._
    m.toSeq.toDF(keyCol, "_n")
  }

  /** The maintained per-source counts. */
  def countStore: Map[String, Long] = synchronized(counts)

  /** The current store as the size table
    * [[Corpus.temperatureWeightsFromSizes]] consumes. */
  def sizesTable: DataFrame = synchronized(sizesDf(counts))

  /** Release emitted-log entries of batches `<= upToBatchId` (their
    * blocks unpersist); the count store is untouched. */
  def releaseEmitted(upToBatchId: Long): Unit = releaseLog(upToBatchId)

  /** The emitted mixture of every committed, not-yet-released batch
    * (batch columns + epoch + batch_id) — None before the first
    * commit AND after a full release (the emitted schema carries the
    * batch's own columns, unknowable before one arrives; consumers
    * following the drain-then-release discipline should pattern-match
    * rather than `.get`). */
  def emitted: Option[DataFrame] = synchronized {
    logFrames.reduceLeftOption(_ unionByName _)
  }
}
