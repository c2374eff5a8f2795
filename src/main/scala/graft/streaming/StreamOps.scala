package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators beyond the incremental-index loop: the
  * event-time windowed usage-stats rollup and the per-url stateful
  * fetch gate.
  */
object StreamOps {

  /** Streaming usage-stats rollup — the stats collector's date-bucketed
    * counters (idb/stats/collect.py aggregates per recordset per day)
    * as an event-time windowed aggregation: 1-day tumbling windows per
    * (recordset, stat_type), closed by the watermark. Late events past
    * `lateness` are dropped; in Append mode each window emits exactly
    * once when it closes — the streaming twin of q_stats_rollup's
    * date_trunc groupBy. */
  def statsWindowed(events: DataFrame, lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day"),
        col("recordset"), col("stat_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day"),
        col("recordset"), col("stat_type"), col("n"))

  /** One fetch attempt outcome flowing through the media loop. */
  final case class FetchEvent(url: String, status: Int,
      at: java.sql.Timestamp)

  /** Per-url fetch state: the media table's (last_status, last_check)
    * pair plus a consecutive-failure counter. */
  final case class UrlState(lastStatus: Int, lastCheckMs: Long,
      failures: Int)

  /** The gate's verdict for a url after folding its latest events. */
  final case class FetchVerdict(url: String, lastStatus: Int,
      failures: Int, due: Boolean)

  /** Retry-interval the reference applies to failed media before
    * rechecking (fetcher.py:106 LAST_CHECK_INTERVAL = '1 month'). */
  val RecheckAfterMs: Long = 30L * 24 * 3600 * 1000

  /** Per-url fetch gate as custom keyed state (mapGroupsWithState):
    * folds each url's fetch outcomes into (last_status, last_check,
    * consecutive failures) and emits whether the url is due for another
    * attempt — the streaming form of the reference's fetch predicate
    * `last_status IS NULL OR (last_status >= 400 AND last_check <
    * now() - interval)` (fetcher.py:213-218), with the failure streak
    * carried as state the batch query cannot express.
    *
    * Retention (opt-in): with `idleTtlMs = Some(ttl)`, a url with no
    * fetch activity for ttl (by event time `at`, watermark-driven) has
    * its state evicted; when it reappears it reads as never-checked —
    * lastStatus −1, due = true — which IS the reference's NULL
    * last_status semantics, so pick ttl ≥ the recheck interval and
    * eviction only ever turns "due later" into "due now" for urls
    * already idle longer than the recheck window. None = state lives
    * forever (the pre-TTL contract). */
  def fetchGate(events: Dataset[FetchEvent],
      recheckAfterMs: Long = RecheckAfterMs,
      idleTtlMs: Option[Long] = None,
      lateness: String = "0 seconds")
      : Dataset[FetchVerdict] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (idleTtlMs.isDefined)
      events.withWatermark("at", lateness) else events
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf) {
        (url: String, evs: Iterator[FetchEvent], state: GroupState[UrlState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = evs.toSeq.sortBy(_.at.getTime)
            if (ordered.isEmpty) Iterator.empty
            else {
              val s0 = state.getOption.getOrElse(UrlState(-1, 0L, 0))
              val s1 = ordered.foldLeft(s0) { (s, e) =>
                val failures = if (e.status >= 400) s.failures + 1 else 0
                UrlState(e.status, e.at.getTime, failures)
              }
              state.update(s1)
              idleTtlMs.foreach { ttl =>
                if (streaming)
                  state.setTimeoutTimestamp(math.max(s1.lastCheckMs + ttl,
                    state.getCurrentWatermarkMs() + 1))
              }
              val due = s1.lastStatus < 0 ||
                (s1.lastStatus >= 400 &&
                  s1.lastCheckMs < System.currentTimeMillis() - recheckAfterMs)
              Iterator.single(
                FetchVerdict(url, s1.lastStatus, s1.failures, due))
            }
          }
      }
  }

  /** Event-time sessionization: activity sessions per key, where a
    * session is a maximal run of events with gaps below `gap` — the
    * usage-analytics view the reference's stats collector approximates
    * with date buckets (idb/stats/collect.py counts per day; a
    * `session_window` is the same rollup with behavioral instead of
    * calendar boundaries). Built-in `session_window` keeps per-key
    * open-session state that MERGES adjacent windows as late-but-
    * within-watermark events arrive and emits each session exactly
    * once when the watermark passes its close — O(open sessions)
    * state, not O(events). */
  def sessionized(events: DataFrame, keyCol: String, gap: String,
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stream-stream correlation of fetch requests with their outcomes —
    * a watermarked event-time INTERVAL join: a result matches its
    * request iff same url and `res_ts` lands in [req_ts, req_ts +
    * `horizon`]. LEFT OUTER semantics give timeout detection for
    * free: once the watermark passes a request's join window with no
    * matching result, the request emits with null outcome columns —
    * the streaming form of the fetcher's dead-url sweep. The time
    * bound + watermarks are what make stream-stream join state
    * BOUNDED (each side holds only rows inside the horizon); an
    * unbounded equi-join would buffer both streams forever. */
  def fetchCorrelate(requests: DataFrame, results: DataFrame,
      horizon: String, lateness: String = "10 minutes"): DataFrame = {
    val req = requests.withWatermark("req_ts", lateness)
    val res = results.withWatermark("res_ts", lateness)
    req.join(res,
      expr(s"""req_url = res_url AND
              |res_ts >= req_ts AND
              |res_ts <= req_ts + INTERVAL $horizon""".stripMargin),
      "leftOuter")
  }

  /** Streaming exact dedup with BOUNDED state:
    * `dropDuplicatesWithinWatermark` holds each key only until the
    * watermark passes its arrival time, so state size tracks the
    * lateness horizon instead of growing with the corpus — the
    * production form of StreamingDedup's keep-first-per-etag path for
    * feeds where re-sends cluster in time (the reference's ingest
    * sees exactly that: harvester retries and publisher re-exports
    * land within days, not years; db_check's etag dedup is the batch
    * twin). Emits the first arrival per key; duplicates inside the
    * horizon are guaranteed dropped, duplicates beyond it re-emit —
    * the documented trade for O(horizon) state. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)
}
