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
  * pair — the discipline that lets state live forever without growth.
  */
object StreamingMonitors {

  final case class Event(key: String, typ: String, tsUs: Long, id: Long)
  final case class Kept(key: String, typ: String, tsUs: Long, id: Long)

  /** Throttle: keep an event iff it is ≥ `windowSec` after the LAST
    * KEPT event of its (key, type) — the rate-limit dialect, distinct
    * from the batch gap-session debounce (an event 2·w after the
    * burst head but within w of a REJECTED middle event is kept here
    * iff the middle was rejected — state remembers kept rows only).
    * Within a micro-batch arrivals sort by (tsUs, id) so replays are
    * deterministic; state is ONE long per (key, type). */
  def throttle(events: DataFrame, windowSec: Long): Dataset[Kept] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("key").cast("string"), col("typ").cast("string"),
        col("tsUs").cast("long"), col("id").cast("long"))
      .as[Event]
      .groupByKey(e => (e.key, e.typ))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (String, String), arrivals: Iterator[Event],
            state: GroupState[Long]) =>
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
          kept.iterator
      }
  }

  final case class Valued(key: String, tsUs: Long, value: Double)
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
    * O(1) state per key, any micro-batch partitioning. */
  def runningDecay(events: DataFrame, tauSec: Double): Dataset[Score] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("key").cast("string"), col("tsUs").cast("long"),
        col("value").cast("double"))
      .as[Valued]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, arrivals: Iterator[Valued],
            state: GroupState[(Long, Double, Long)]) =>
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
            Iterator.single(Score(key, t2, next._2, next._3))
          }
      }
  }

  final case class StateEvent(key: String, tsUs: Long, id: Long,
      state: String)
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
    * key: one (state, startUs) pair. */
  def runningScd2(events: DataFrame): Dataset[Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("key").cast("string"), col("tsUs").cast("long"),
        col("id").cast("long"), col("state").cast("string"))
      .as[StateEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, arrivals: Iterator[StateEvent],
            state: GroupState[(String, Long)]) =>
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Interval]
          arrivals.toArray.sortBy(e => (e.tsUs, e.id)).foreach { e =>
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
          out.iterator
      }
  }

  final case class CatArrival(tsUs: Long, cat: String)
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
    * the categorical domain, the same contract the batch operator
    * already carries (a production deployment adds a state TTL via
    * event-time timeout once the watermark passes the window; the
    * drift math is unaffected). The reference is a driver-side map:
    * it IS a constant dimension (a fixed training distribution), not
    * data. */
  def runningDrift(events: DataFrame, windowSec: Long,
      reference: Map[String, Long]): Dataset[WindowDrift] = {
    require(reference.nonEmpty && reference.values.forall(_ > 0))
    val spark = events.sparkSession
    import spark.implicits._
    val nB = reference.values.sum
    val windowUs = windowSec * 1000000L
    events.select(col("tsUs").cast("long"), col("cat").cast("string"))
      .as[CatArrival]
      .groupByKey(e => math.floorDiv(e.tsUs, windowUs) * windowUs)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (start: Long, arrivals: Iterator[CatArrival],
            state: GroupState[Map[String, Long]]) =>
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
