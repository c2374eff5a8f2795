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

  final case class Arrival(group: String, id: Long, score: Double)
  final case class Ranked(group: String, id: Long, score: Double, rank: Int)

  /** @param rows (group, id, score) arrivals
    * @param k    kept per group, smallest score first */
  def runningTopK(rows: DataFrame, k: Int): Dataset[Ranked] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("group").cast("string"), col("id").cast("long"),
        col("score").cast("double"))
      .as[Arrival]
      .groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        mergeAndEmit(k))
  }

  private def mergeAndEmit(k: Int)(
      group: String, arrivals: Iterator[Arrival],
      state: GroupState[List[(Double, Long)]]): Iterator[Ranked] = {
    val kept = state.getOption.getOrElse(Nil)
    val merged = (kept ++ arrivals.map(a => (a.score, a.id)))
      .distinct.sorted.take(k)
    if (merged == kept) Iterator.empty
    else {
      state.update(merged)
      merged.iterator.zipWithIndex.map { case ((s, id), i) =>
        Ranked(group, id, s, i + 1)
      }
    }
  }
}
