package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous Misra-Gries heavy hitters — the streaming twin of the
  * batch [[graft.functions.MisraGriesAgg]] candidate pass: per group, a
  * bounded ≤`capacity`-entry counter map folded over the stream with
  * the same decrement rounds, held in keyed state forever at O(capacity)
  * memory. Each micro-batch a changed group re-emits its current
  * summary (Update-style snapshots in Append mode, the StreamingTopK
  * discipline).
  *
  * Same guarantee as the batch pass, continuously maintained: any key
  * whose count since stream start exceeds n_group/(capacity+1) is
  * present in the group's latest summary. Exactification stays a batch
  * join (recount candidates against the stored corpus) — the streaming
  * side's job is the candidate set, which is what makes it bounded.
  *
  * Runs identically on a batch Dataset (state starts empty, one
  * "batch"), which is how the spec cross-checks it against the
  * TypedImperativeAggregate on the same rows. */
object StreamingHeavyHitters {

  final case class Arrival(group: String, key: String, tsUs: Long,
      eventTs: java.sql.Timestamp)
  final case class Summary(group: String, key: String, cnt: Long)

  /** @param tsCol      opt-in event-time column: with `idleTtlSec`,
    *                   groups idle past the TTL are evicted once the
    *                   watermark passes lastSeen + ttl (the dropped
    *                   summary restarts from zero on revival — the
    *                   standard sketch-retention trade); None = state
    *                   lives forever (the pre-TTL contract). */
  def runningHeavyHitters(rows: DataFrame, capacity: Int,
      tsCol: Option[String] = None, idleTtlSec: Long = 0L,
      lateness: String = "0 seconds"): Dataset[Summary] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val streaming = rows.isStreaming
    val src0 = tsCol match {
      case Some(t) => rows.select(col("group").cast("string"),
          col("key").cast("string"),
          unix_micros(col(t).cast("timestamp")).as("tsUs"),
          col(t).cast("timestamp").as("eventTs"))
        .withWatermark("eventTs", lateness)
      case None => rows.select(col("group").cast("string"),
        col("key").cast("string"), lit(0L).as("tsUs"),
        lit(null).cast("timestamp").as("eventTs"))
    }
    val timeoutConf =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src0.as[Arrival]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        mergeAndEmit(capacity,
          if (tsCol.isDefined && streaming) Some(idleTtlSec) else None))
  }

  private def mergeAndEmit(capacity: Int, idleTtl: Option[Long])(
      group: String, arrivals: Iterator[Arrival],
      state: GroupState[Map[String, Long]]): Iterator[Summary] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var lastSeenUs = Long.MinValue
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    state.getOption.foreach(m => buf ++= m)
    var changed = false
    arrivals.foreach { a =>
      changed = true
      lastSeenUs = math.max(lastSeenUs, a.tsUs)
      buf.get(a.key) match {
        case Some(c) => buf(a.key) = c + 1
        case None if buf.size < capacity => buf(a.key) = 1L
        case None =>
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf(k) = c - 1
          }
          dead.foreach(buf.remove)
      }
    }
    if (!changed) Iterator.empty
    else {
      state.update(buf.toMap)
      idleTtl.foreach { ttl =>
        if (lastSeenUs != Long.MinValue)
          state.setTimeoutTimestamp(math.max(
            lastSeenUs / 1000L + ttl * 1000L,
            state.getCurrentWatermarkMs() + 1))
      }
      buf.toArray.sortBy { case (k, c) => (-c, k) }
        .iterator.map { case (k, c) => Summary(group, k, c) }
    }
  }
}
