package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running top-k per group over a CONTINUOUS stream — the streaming
  * twin of the batch heap operator (graft.plans.TopKPerGroup), for the
  * leaderboard shape: "the current k best rows of every group, kept
  * current as data arrives" (best recordsets by quality, best
  * documents per source, nearest neighbors per probe as vectors
  * stream in).
  *
  * Keyed state holds each group's k best (score asc, id asc — make
  * the order total exactly like the batch operator requires) as a
  * bounded sorted list: O(k) memory per group forever, no matter how
  * much data streams through. On every micro-batch each group merges
  * its arrivals into the kept set and, when membership or order
  * changed, re-emits its refreshed top-k with ranks (Append mode —
  * each emission is a fresh snapshot tagged by rank).
  *
  * Runs identically on a batch Dataset (state starts empty, one
  * "batch"), which is how the spec cross-checks it against
  * TopKPerGroup on the same data.
  */
object StreamingTopK {

  final case class Arrival(group: String, id: Long, score: Double,
      tsUs: Long, eventTs: java.sql.Timestamp)
  final case class Ranked(group: String, id: Long, score: Double, rank: Int)

  /** @param rows  (group, id, score) arrivals
    * @param k     kept per group, smallest score first
    * @param tsCol opt-in event-time column: with `idleTtlSec`, a
    *              group's leaderboard evicts once the watermark
    *              passes lastSeen + ttl (a revived group rebuilds
    *              from new arrivals only — the leaderboard-retention
    *              trade); None = state lives forever. */
  def runningTopK(rows: DataFrame, k: Int,
      tsCol: Option[String] = None, idleTtlSec: Long = 0L,
      lateness: String = "0 seconds"): Dataset[Ranked] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val streaming = rows.isStreaming
    val src0 = tsCol match {
      case Some(t) => rows.select(col("group").cast("string"),
          col("id").cast("long"), col("score").cast("double"),
          unix_micros(col(t).cast("timestamp")).as("tsUs"),
          col(t).cast("timestamp").as("eventTs"))
        .withWatermark("eventTs", lateness)
      case None => rows.select(col("group").cast("string"),
        col("id").cast("long"), col("score").cast("double"),
        lit(0L).as("tsUs"), lit(null).cast("timestamp").as("eventTs"))
    }
    val timeoutConf =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src0.as[Arrival]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        mergeAndEmit(k,
          if (tsCol.isDefined && streaming) Some(idleTtlSec) else None))
  }

  private def mergeAndEmit(k: Int, idleTtl: Option[Long])(
      group: String, arrivals: Iterator[Arrival],
      state: GroupState[List[(Double, Long)]]): Iterator[Ranked] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val kept = state.getOption.getOrElse(Nil)
    var lastSeenUs = Long.MinValue
    val merged = (kept ++ arrivals.map { a =>
        lastSeenUs = math.max(lastSeenUs, a.tsUs); (a.score, a.id) })
      .distinct.sorted.take(k)
    def arm(): Unit = idleTtl.foreach { ttl =>
      if (lastSeenUs != Long.MinValue && state.exists)
        state.setTimeoutTimestamp(math.max(
          lastSeenUs / 1000L + ttl * 1000L,
          state.getCurrentWatermarkMs() + 1))
    }
    if (merged == kept) { arm(); Iterator.empty }
    else {
      state.update(merged)
      arm()
      merged.iterator.zipWithIndex.map { case ((s, id), i) =>
        Ranked(group, id, s, i + 1)
      }
    }
  }
}
