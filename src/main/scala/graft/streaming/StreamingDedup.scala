package graft.streaming

import graft.operators.TextDedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Deduplication for CONTINUOUS document ingest — the streaming twin
  * of the batch dedup family (operators/TextDedup.scala), for the
  * pipeline shape where a corpus is grown incrementally and each new
  * batch must be checked against everything already admitted.
  *
  * Two tiers, mirroring the batch design:
  *  - exact: content-hash dedup inside the engine's watermark horizon
  *    (`dropDuplicatesWithinWatermark` — state is bounded by the
  *    watermark, the Spark-native form of the reference's seen-etags
  *    set, db_check.py:271-297);
  *  - near-dup: per-document MinHash signatures (the native one-pass
  *    kernel — per-row work, so it streams without any aggregation),
  *    banded LSH exactly like the batch path, then PER-BUCKET KEYED
  *    STATE: each (band, bucket) group remembers the doc ids it has
  *    admitted and every arriving doc emits a candidate pair against
  *    each remembered occupant. Cross-batch recall comes from the
  *    state store, not a re-scan of the corpus — at 100 TB the
  *    admitted corpus is never re-read.
  */
object StreamingDedup {

  /** Exact streaming dedup on a content-hash column: keeps the first
    * arrival of each etag, drops repeats within the watermark horizon
    * (state for an etag is reclaimable once the watermark passes its
    * event time). */
  def exactDedup(docs: DataFrame, etagCol: String, tsCol: String,
      lateness: String): DataFrame =
    docs.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(Seq(etagCol))

  /** One LSH band-bucket hit for a document (tsUs/eventTs carry the
    * document's event time in retention mode; 0/null otherwise). */
  final case class BandHit(docId: Long, band: Int, bucket: Long,
      tsUs: Long, eventTs: java.sql.Timestamp)

  /** A near-dup candidate: `docId` collided with earlier-admitted
    * `matchedDocId` in some band. A pair sharing several bands emits
    * once per band (bucket groups are independent keys); downstream
    * exact-Jaccard verification deduplicates, like the batch path's
    * `distinct()`. */
  final case class DupCandidate(docId: Long, matchedDocId: Long, band: Int)

  /** Per-bucket occupancy cap — the streaming form of the batch
    * hot-bucket guard (TextDedup.MaxBucketSize): a degenerate bucket
    * (boilerplate corpora) stops accumulating state and stops emitting
    * pairs once full, bounding both state size and output quadratics.
    * Docs in a capped bucket still pair through their other bands. */
  val MaxBucketOccupants = 1000

  /** Banded LSH candidate pairs over a STREAM of (id, text) documents.
    * Emits, for every arriving document, one candidate per
    * already-admitted occupant of each of its band buckets (including
    * earlier docs of the same micro-batch, processed in arrival
    * order). Runs identically on a batch Dataset (state starts empty),
    * which is how the spec cross-checks it against the batch
    * lshCandidates operator.
    *
    * Retention (opt-in, the round-14 state-TTL hardening): with
    * `tsCol = Some(t)` and `retentionSec = r`, new arrivals only pair
    * against occupants whose event time is within `r` of the
    * watermark (older occupants are pruned on access), and a bucket
    * idle past its newest occupant + r is evicted wholesale by
    * event-time timeout — "dedup against the last r seconds of
    * corpus", the bounded-index contract a forever stream needs.
    * Without tsCol the index is lifetime (the batch-equivalent form,
    * unchanged). */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3,
      maxBucketOccupants: Int = MaxBucketOccupants,
      tsCol: Option[String] = None,
      retentionSec: Long = 0L,
      lateness: String = "0 seconds"): Dataset[DupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val streaming = docs.isStreaming
    val sigs = docs.select(col(idCol).cast("long").as("id") +:
        graft.functions.NativeText.minhashSig(
          split(col(textCol), " "), shingleSize).as("sig") +:
        tsCol.toSeq.map(t => col(t).cast("timestamp").as("eventTs")): _*)
      .where(size(col("sig")) > 0)
    val hits0 = TextDedup.bandBuckets(sigs, "id",
      passthroughCols = tsCol.toSeq.map(_ => "eventTs"))
    val hits = (tsCol match {
      case Some(_) => hits0
        .select(col("id").as("docId"), col("band"), col("bucket"),
          unix_micros(col("eventTs")).as("tsUs"), col("eventTs"))
        .withWatermark("eventTs", lateness)
      case None => hits0
        .select(col("id").as("docId"), col("band"), col("bucket"),
          lit(0L).as("tsUs"),
          lit(null).cast("timestamp").as("eventTs"))
    }).as[BandHit]
    val timeoutConf =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    hits.groupByKey(h => (h.band, h.bucket))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        emitAgainstState(maxBucketOccupants,
          if (tsCol.isDefined && streaming) Some(retentionSec) else None))
  }

  private def emitAgainstState(cap: Int, retention: Option[Long])(
      key: (Int, Long), hits: Iterator[BandHit],
      state: GroupState[List[(Long, Long)]]): Iterator[DupCandidate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // deterministic in-batch order: ascending doc id
    val arrived = hits.map(h => (h.docId, h.tsUs)).toArray.sortBy(_._1)
    var occupants = state.getOption.getOrElse(Nil)
    // retention mode: prune occupants older than watermark − retention
    // BEFORE pairing — expired corpus never yields candidates
    retention.foreach { r =>
      val cutUs = (state.getCurrentWatermarkMs() - r * 1000L) * 1000L
      occupants = occupants.filter(_._2 >= cutUs)
    }
    val out = Seq.newBuilder[DupCandidate]
    arrived.foreach { case (d, ts) =>
      if (occupants.length < cap && !occupants.exists(_._1 == d)) {
        occupants.foreach { case (prev, _) =>
          out += DupCandidate(d, prev, key._1) }
        occupants = (d, ts) :: occupants
      }
    }
    if (occupants.isEmpty) state.remove() else state.update(occupants)
    retention.foreach { r =>
      if (state.exists) {
        val newestMs = occupants.iterator.map(_._2).max / 1000L
        state.setTimeoutTimestamp(math.max(newestMs + r * 1000L,
          state.getCurrentWatermarkMs() + 1))
      }
    }
    out.result().iterator
  }
}
