package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the round-13 batch monitors: the THROTTLE
  * debounce dialect (which the batch [[graft.operators.Events.debounce]]
  * scaladoc explicitly leaves to keyed state — its kept set depends on
  * previously-KEPT rows, so it is not a window function), a
  * continuously-maintained decay score (exercising
  * [[graft.operators.Events.decayScore]]'s snapshot-reconciliation
  * property live: score(T2) = score(T1)·exp(−(T2−T1)/τ) + delta), and
  * a windowed drift monitor against a fixed reference distribution.
  * All keyed state is O(1) per group — a timestamp, a (score, horizon)
  * pair.
  *
  * State LIFETIME (the round-14 hardening): per-key state being O(1)
  * bounds memory per key, but the KEY domain grows with the stream, so
  * every op here carries watermark-driven event-time eviction:
  *   - [[throttle]] and [[runningDrift]] evict ALWAYS — their state is
  *     provably dead once the watermark passes it (a throttle key's
  *     lastKept can no longer suppress any in-horizon event; a tumbling
  *     window can no longer receive in-horizon rows), so eviction
  *     changes NO in-horizon result (StreamingMonitorsSpec pins both
  *     the eviction and the unchanged output);
  *   - [[runningDecay]] and [[runningScd2]] evict on an OPT-IN idle
  *     TTL — their state is a lifetime aggregate (a score, an open
  *     dimension interval), so eviction is a retention POLICY with a
  *     documented information loss, not a free cleanup.
  * In batch execution (how the specs cross-check the twins) timeouts
  * never fire and the watermark is absent, so the handlers skip the
  * timeout plumbing entirely — batch results are identical to the
  * pre-TTL forms.
  */
object StreamingMonitors {

  /** Clamp an event-time timeout target to be strictly after the
    * current watermark (Spark rejects a timeout at-or-before it —
    * reachable when a straggler older than the TTL horizon arrives and
    * its state would be born already-expired: it then expires on the
    * next watermark advance instead of throwing). Streaming-only. */
  private def armTimeout(state: GroupState[_], targetMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(targetMs,
      state.getCurrentWatermarkMs() + 1))

  final case class Event(key: String, typ: String, tsUs: Long, id: Long,
      eventTs: java.sql.Timestamp)
  final case class Kept(key: String, typ: String, tsUs: Long, id: Long)

  /** Throttle: keep an event iff it is ≥ `windowSec` after the LAST
    * KEPT event of its (key, type) — the rate-limit dialect, distinct
    * from the batch gap-session debounce (an event 2·w after the
    * burst head but within w of a REJECTED middle event is kept here
    * iff the middle was rejected — state remembers kept rows only).
    * Within a micro-batch arrivals sort by (tsUs, id) so replays are
    * deterministic; state is ONE long per (key, type).
    *
    * Eviction (always on, lossless): state times out once the
    * watermark passes lastKept + windowSec — at that point every
    * in-horizon future event satisfies the keep condition whether the
    * state exists or not, so dropping it cannot change any result
    * within the `lateness` horizon.
    *
    * LATENESS CONTRACT: the watermark is always applied, and the
    * default `lateness` of "0 seconds" means any event arriving in a
    * LATER micro-batch with an event time at-or-below the stream's
    * max-so-far is discarded as late (the standard watermark rule).
    * An out-of-order stream MUST pass an explicit `lateness` covering
    * its disorder bound, or those events silently vanish — in-batch
    * disorder is fine (arrivals sort by (tsUs, id) before the state
    * update), the horizon only governs CROSS-batch stragglers. */
  def throttle(events: DataFrame, windowSec: Long,
      lateness: String = "0 seconds"): Dataset[Kept] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    events.select(col("key").cast("string"), col("typ").cast("string"),
        col("tsUs").cast("long"), col("id").cast("long"),
        timestamp_micros(col("tsUs")).as("eventTs"))
      .withWatermark("eventTs", lateness)
      .as[Event]
      .groupByKey(e => (e.key, e.typ))
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (_: (String, String), arrivals: Iterator[Event],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val windowUs = windowSec * 1000000L
            var lastKept = state.getOption.getOrElse(Long.MinValue)
            val kept = scala.collection.mutable.ArrayBuffer.empty[Kept]
            arrivals.toArray.sortBy(e => (e.tsUs, e.id)).foreach { e =>
              if (lastKept == Long.MinValue || e.tsUs - lastKept >= windowUs) {
                kept += Kept(e.key, e.typ, e.tsUs, e.id)
                lastKept = e.tsUs
              }
            }
            if (kept.nonEmpty) state.update(lastKept)
            if (streaming && state.exists)
              armTimeout(state, (lastKept + windowUs) / 1000L + 1)
            kept.iterator
          }
      }
  }

  final case class Valued(key: String, tsUs: Long, value: Double,
      eventTs: java.sql.Timestamp)
  final case class Score(key: String, horizonUs: Long, score: Double,
      nEvents: Long)

  /** Continuously-maintained per-key decay score: state is (horizon,
    * score, n); each micro-batch ages the stored score to the batch's
    * max timestamp and adds the new terms —
    *   s' = s·exp(−(T2−T1)/τ) + Σ v_i·exp(−(T2−t_i)/τ)
    * — the reconciliation identity the batch operator's scaladoc
    * promises, run live. The emitted snapshot approximates the batch
    * [[graft.operators.Events.decayScore]] over all rows so far to
    * float tolerance (the batch side rounds each term to a micro
    * grid for oracle determinism; the incremental side compounds
    * exp() instead — StreamingMonitorsSpec pins the agreement band).
    * O(1) state per key, any micro-batch partitioning.
    *
    * Eviction (opt-in retention policy): with `idleTtlSec = Some(ttl)`,
    * a key idle past the TTL is dropped once the watermark passes its
    * horizon + ttl. The dropped score mass is at most
    * score·exp(−ttl/τ) of any FUTURE reading (the score a revived key
    * would have carried forward), so choosing ttl ≥ ~20·τ makes the
    * loss below double precision; with None state lives forever (the
    * pre-TTL lifetime-aggregate contract). */
  def runningDecay(events: DataFrame, tauSec: Double,
      idleTtlSec: Option[Long] = None,
      lateness: String = "0 seconds"): Dataset[Score] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val timeoutConf =
      if (idleTtlSec.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val src0 = events.select(col("key").cast("string"),
      col("tsUs").cast("long"), col("value").cast("double"),
      timestamp_micros(col("tsUs")).as("eventTs"))
    val src = if (idleTtlSec.isDefined) src0.withWatermark("eventTs", lateness)
      else src0
    src.as[Valued]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, arrivals: Iterator[Valued],
            state: GroupState[(Long, Double, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val tauUs = tauSec * 1e6
            val batch = arrivals.toArray
            if (batch.isEmpty) Iterator.empty
            else {
              val (t1, s1, n1) = state.getOption.getOrElse(
                (Long.MinValue, 0.0, 0L))
              val t2 = math.max(t1, batch.map(_.tsUs).max)
              val aged = if (t1 == Long.MinValue) 0.0
                else s1 * math.exp((t1 - t2) / tauUs)
              val added = batch.iterator
                .map(v => v.value * math.exp((v.tsUs - t2) / tauUs)).sum
              val next = (t2, aged + added, n1 + batch.length)
              state.update(next)
              idleTtlSec.foreach { ttl =>
                if (streaming) armTimeout(state, t2 / 1000L + ttl * 1000L)
              }
              Iterator.single(Score(key, t2, next._2, next._3))
            }
          }
      }
  }

  final case class StateEvent(key: String, tsUs: Long, id: Long,
      state: String, eventTs: java.sql.Timestamp)
  final case class Interval(key: String, state: String, validFromUs: Long,
      validToUs: Option[Long])

  /** Streaming SCD-2 maintainer — the live twin of
    * [[graft.operators.Events.stateIntervals]]: keyed state holds the
    * OPEN interval (current state + its start); each arrival that
    * changes the state CLOSES the old interval (emitted with
    * valid_to) and opens a new one (emitted open-ended — downstream
    * upserts by (key, valid_from), so the close of an interval
    * supersedes its earlier open-ended emission; the idempotent-merge
    * discipline of the batch twin's consumers). In-batch arrivals
    * sort by (ts, id) — the batch operator's total order — so the
    * emitted interval set over in-order streams EQUALS the batch
    * operator's output row-for-row (StreamingMonitorsSpec pins it).
    * Cross-batch late events are the streaming trade: an arrival
    * older than the open interval's start is ignored (documented —
    * the watermarked upstream owns reordering). State is O(1) per
    * key: one (state, startUs) pair.
    *
    * Eviction (opt-in retention policy): with `idleTtlSec = Some(ttl)`
    * an entity idle past the TTL has its open interval dropped once
    * the watermark passes lastSeen + ttl; if the entity later revives,
    * a FRESH open interval is emitted even when its state value is
    * unchanged — the standard dimension-retention trade (the closed
    * history already emitted is unaffected). None = state lives
    * forever (a dimension's default). */
  def runningScd2(events: DataFrame,
      idleTtlSec: Option[Long] = None,
      lateness: String = "0 seconds"): Dataset[Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val timeoutConf =
      if (idleTtlSec.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val src0 = events.select(col("key").cast("string"),
      col("tsUs").cast("long"), col("id").cast("long"),
      col("state").cast("string"),
      timestamp_micros(col("tsUs")).as("eventTs"))
    val src = if (idleTtlSec.isDefined) src0.withWatermark("eventTs", lateness)
      else src0
    src.as[StateEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, arrivals: Iterator[StateEvent],
            state: GroupState[(String, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var open = state.getOption
            var lastSeenUs = Long.MinValue
            val out = scala.collection.mutable.ArrayBuffer.empty[Interval]
            arrivals.toArray.sortBy(e => (e.tsUs, e.id)).foreach { e =>
              lastSeenUs = math.max(lastSeenUs, e.tsUs)
              open match {
                case None =>
                  open = Some((e.state, e.tsUs))
                  out += Interval(key, e.state, e.tsUs, None)
                case Some((cur, from)) if e.tsUs >= from && e.state != cur =>
                  out += Interval(key, cur, from, Some(e.tsUs))
                  open = Some((e.state, e.tsUs))
                  out += Interval(key, e.state, e.tsUs, None)
                case _ => // same state, or a late pre-open arrival: no-op
              }
            }
            open.foreach(state.update)
            idleTtlSec.foreach { ttl =>
              if (streaming && state.exists && lastSeenUs != Long.MinValue)
                armTimeout(state, lastSeenUs / 1000L + ttl * 1000L)
            }
            out.iterator
          }
      }
  }

  final case class CatArrival(tsUs: Long, cat: String,
      eventTs: java.sql.Timestamp)
  final case class WindowDrift(windowStartUs: Long, nA: Long, tv6: Double)

  /** Per-window categorical drift against a FIXED reference
    * distribution (the training-set mix, say): tumbling windows keyed
    * on floor(ts/window), per-window category counts held in keyed
    * state, and on every micro-batch a changed window re-emits its
    * CURRENT total-variation distance vs the reference — the exact
    * integer cross-multiplication of
    * [[graft.operators.Profile.categoryDrift]], so the final snapshot
    * of a window equals the batch operator run on that window's rows
    * (StreamingMonitorsSpec pins it). The live "is today's traffic
    * still shaped like the training mix" alarm.
    *
    * State per window = one count per observed category — bounded by
    * the categorical domain — and windows are EVICTED once the
    * watermark passes windowEnd + stateTtlSec (always on: a tumbling
    * window whose end is behind the watermark can receive no further
    * in-horizon rows, so its counts are dead weight; the per-window
    * map that previously grew "with every window forever" now lives
    * exactly one watermark horizon). A straggler older than the
    * horizon restarts its window from zero — the watermark contract,
    * same as every windowed agg. The reference is a driver-side map:
    * it IS a constant dimension (a fixed training distribution), not
    * data.
    *
    * LATENESS CONTRACT: as with [[throttle]], the watermark is always
    * applied and the "0 seconds" default drops any CROSS-micro-batch
    * event older than the max event time seen — a window's counts then
    * miss those stragglers (and a window fully behind the watermark is
    * evicted and would restart from zero). Out-of-order streams must
    * pass a `lateness` covering their disorder bound explicitly. */
  def runningDrift(events: DataFrame, windowSec: Long,
      reference: Map[String, Long],
      lateness: String = "0 seconds",
      stateTtlSec: Long = 0L): Dataset[WindowDrift] = {
    require(reference.nonEmpty && reference.values.forall(_ > 0))
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val nB = reference.values.sum
    val windowUs = windowSec * 1000000L
    events.select(col("tsUs").cast("long"), col("cat").cast("string"),
        timestamp_micros(col("tsUs")).as("eventTs"))
      .withWatermark("eventTs", lateness)
      .as[CatArrival]
      .groupByKey(e => math.floorDiv(e.tsUs, windowUs) * windowUs)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (start: Long, arrivals: Iterator[CatArrival],
            state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val buf = scala.collection.mutable.HashMap.empty[String, Long]
            state.getOption.foreach(buf ++= _)
            var changed = false
            arrivals.foreach { a =>
              changed = true
              buf(a.cat) = buf.getOrElse(a.cat, 0L) + 1L
            }
            if (!changed) Iterator.empty
            else {
              state.update(buf.toMap)
              if (streaming)
                armTimeout(state,
                  (start + windowUs) / 1000L + stateTtlSec * 1000L)
              val nA = buf.valuesIterator.sum
              val cats = buf.keySet ++ reference.keySet
              val num = cats.iterator.map { c =>
                math.abs(buf.getOrElse(c, 0L) * nB -
                  reference.getOrElse(c, 0L) * nA)
              }.sum
              val tv = BigDecimal(num.toDouble / (2.0 * nA * nB))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Iterator.single(WindowDrift(start, nA, tv))
            }
          }
      }
  }
}
