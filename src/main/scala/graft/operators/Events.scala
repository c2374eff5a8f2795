package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics over (key, ts, type) tables — the
  * offline twins of the streaming ops (streaming/StreamOps.scala's
  * session_window rollup) and the reference's stats/usage queries
  * (idb/stats API family): gap-based sessionization and ordered
  * funnels, both as per-key window/join plans that shuffle once on
  * the key and never collect.
  */
object Events {

  /** Gap-based sessionization: a session is a maximal run of a key's
    * events with inter-event gaps <= `gapMinutes`. One exchange on the
    * key; boundaries via lag, session ids via a running sum of
    * boundary flags — the standard formulation, and the batch twin of
    * the streaming `session_window` aggregation (same boundaries on
    * the same data; the streaming side merges late events, the batch
    * side sees them in order). Timestamps compare as exact
    * microseconds, so both engines of the oracle pair see identical
    * arithmetic. Ties in `ts` order arbitrarily but can never split a
    * session (gap 0), so session ids are deterministic. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(us)
    val boundary =
      when(us - lag(us, 1).over(w) > gapMinutes * 60L * 1000000L, 1L)
        .otherwise(0L)   // first event: lag NULL -> NULL > x is NULL -> 0
    events
      .withColumn("_us", us)
      .withColumn("session", sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered funnel: for each key, the earliest chain of `steps` where
    * step i+1 happens strictly AFTER the chosen (earliest-qualifying)
    * time of step i — the classic min-ts chain. Each stage joins the
    * per-key frontier (one row per key) against only that step's
    * events and re-aggregates to one row per key, so no stage ever
    * builds a per-key cross product; `depth` counts completed steps
    * (t_i null implies t_{i+1} null by construction). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t0"))
    for (i <- 1 until steps.size) {
      val nxt = events.filter(col(typeCol) === steps(i))
        .select(col(keyCol).as("_k"), col(tsCol).as("_ts"))
      val grpCols: Seq[Column] =
        col(keyCol) +: (0 until i).map(j => col(s"t$j"))
      acc = acc
        .join(nxt, acc(keyCol) === col("_k") &&
          col("_ts") > acc(s"t${i - 1}"), "left")
        .groupBy(grpCols: _*)
        .agg(min(col("_ts")).as(s"t$i"))
    }
    acc.withColumn("depth",
      steps.indices.map(i =>
        when(col(s"t$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
        .cast("int"))
  }

  /** SCD-2 state intervals: collapse a key's ordered event stream into
    * maximal runs of equal `stateCol`, emitting one row per run with
    * `valid_from` (the run's first event ts) and `valid_to` (the NEXT
    * run's start, null while current) — the slowly-changing-dimension
    * type-2 table a warehouse derives from a mutation log, and the
    * batch twin of the streaming state tracker. Reference analogue:
    * the version-history chain idb keeps per record etag
    * (RecordStore's version assignment), generalized to arbitrary
    * state columns.
    *
    * One exchange on the key; change detection via lag, `valid_to`
    * via lead OVER THE CHANGE ROWS ONLY (the second window reads the
    * runs-sized relation, not the stream). `tieCol` breaks equal-ts
    * ordering deterministically (pass the event id). */
  def stateIntervals(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .where(col("_prev").isNull || col("_prev") =!= col(stateCol))
    val wc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .select(col(keyCol), col(stateCol), col("valid_from"),
        col("valid_to"))
  }

  /** Burst debounce: keep only the FIRST event of every burst, where a
    * burst is a maximal run of a (key, type)'s events with inter-event
    * gaps <= `windowSec` — the dedup a telemetry pipeline applies to
    * retry storms and double-clicks before counting anything. The
    * kept rows are exactly the [[sessionize]] boundary rows
    * (partitioned by key AND type): an event survives iff its gap
    * from the previous RAW event exceeds the window — which IS
    * "first of each gap-session", since a session is a maximal run
    * of sub-window gaps. (The other debounce dialect — "within w of
    * the last KEPT event" — is a throttle: it needs iterated state
    * and its kept set is not a pure window function; the streaming
    * side owns that one via mapGroupsWithState.)
    *
    * One exchange on (key, type); boundaries via lag, kept rows =
    * boundary rows themselves (no second window, no running sum —
    * unlike [[sessionize]] we only need the heads). Equal-ts ties
    * order by `tieCol` for a deterministic kept set. */
  def debounce(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, tieCol: String, windowSec: Long): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol), col(typeCol))
      .orderBy(us, col(tieCol))
    events
      .withColumn("_gap_us", us - lag(us, 1).over(w))
      .where(col("_gap_us").isNull ||
        col("_gap_us") > windowSec * 1000000L)
      .drop("_gap_us")
  }

  /** Week-over-week user churn: for each week pair (w−1 → w), how
    * many keys were active in both (retained), only in w−1 (churned),
    * only in w (new) — the top-line health metric next to
    * [[graft.queries.Relational]]'s retention cohorts (which slice by
    * SIGNUP week; this slices by adjacent-week presence). Exact set
    * arithmetic: one (key, week) distinct, a self-join shifted by one
    * week interval, three counts — weeks-sized relations after the
    * first distinct, nothing row-expanding. */
  def weeklyChurn(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val active = events
      .select(col(keyCol).as("_k"),
        date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    val prev = active.select(col("_k"),
      (col("week") + expr("INTERVAL 7 DAYS")).as("week"))
    val weeks = active.select(col("week")).distinct()
    // left: this week's actives vs last week's; full outer per key
    val joined = active.withColumn("_cur", lit(1))
      .join(prev.withColumn("_prv", lit(1)), Seq("week", "_k"),
        "full_outer")
    joined.join(weeks, Seq("week"), "left_semi") // drop the phantom week after the last
      .groupBy(col("week"))
      .agg(
        sum(when(col("_cur").isNotNull && col("_prv").isNotNull, 1L)
          .otherwise(0L)).as("retained"),
        sum(when(col("_cur").isNotNull && col("_prv").isNull, 1L)
          .otherwise(0L)).as("fresh"),
        sum(when(col("_cur").isNull && col("_prv").isNotNull, 1L)
          .otherwise(0L)).as("churned"))
      .orderBy(col("week"))
  }

  /** Daily OHLC bars per key: open/high/low/close of a measure within
    * each (key, day) — first/last by an exact (timestamp, id) total
    * order via min_by/max_by, extremes by plain min/max; ONE
    * aggregation, no window, no sort (the time-series summary shape
    * at any scale). */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame =
    events
      .select(col(keyCol), date_trunc("day", col(tsCol)).as("day"),
        col(valueCol).as("_v"),
        struct(unix_micros(col(tsCol)).as("us"), col(tieCol).as("tie"))
          .as("_ord"))
      .groupBy(col(keyCol), col("day"))
      .agg(min_by(col("_v"), col("_ord")).as("open"),
        max(col("_v")).as("high"), min(col("_v")).as("low"),
        max_by(col("_v"), col("_ord")).as("close"),
        count(lit(1)).as("n"))

  /** Calendar continuity audit: per key, the span of active days
    * (first→last), how many of them were active, and the gap count —
    * the "is this feed actually daily" data-quality check. Exact
    * integer day arithmetic off one (key, day) distinct + one
    * aggregation; nothing generates calendar rows (a sequence()
    * explode would manufacture span-sized data — the count is
    * span − active, no materialization needed). */
  def calendarGaps(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    events
      .select(col(keyCol),
        to_date(date_trunc("day", col(tsCol))).as("_d"))
      .distinct()
      .groupBy(col(keyCol))
      .agg(min(col("_d")).as("first_day"), max(col("_d")).as("last_day"),
        count(lit(1)).as("active_days"))
      .withColumn("span_days",
        (datediff(col("last_day"), col("first_day")) + lit(1))
          .cast("long"))
      .withColumn("gap_days",
        (col("span_days") - col("active_days")).cast("long"))

  /** Inter-event burstiness per key (Goh & Barabási 2008):
    *   B = (σ − μ)/(σ + μ)  over the key's inter-event gap
    * distribution — −1 = metronome, 0 = Poisson, →1 = heavy bursts;
    * the signal that separates retry storms and bot traffic from
    * organic activity. Algebraized so the only floating steps are ONE
    * sqrt and ONE division:
    *   B = (√(n·q − s²) − s) / (√(n·q − s²) + s),
    * s = Σ gaps, q = Σ gaps² in integer SECONDS (micro gaps would
    * overflow q at week-long spans; second floors lose nothing a
    * burstiness score cares about). Keys need ≥ `minGaps` gaps. One
    * key-window lag pass + one aggregation. */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
      minGaps: Int): DataFrame = {
    val us = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(us)
    val gaps = events
      .withColumn("_gap", floor((us - lag(us, 1).over(w)) / lit(1000000L))
        .cast("long"))
      .where(col("_gap").isNotNull)
    val radicand = col("_n") * col("_q") - col("_s") * col("_s")
    gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), sum(col("_gap")).as("_s"),
        sum(col("_gap") * col("_gap")).as("_q"))
      .where(col("_n") >= minGaps && col("_s") > 0) // s=0 → B undefined (0/0)
      .select(col(keyCol), col("_n").as("n_gaps"),
        round((sqrt(radicand.cast("double")) - col("_s").cast("double")) /
          (sqrt(radicand.cast("double")) + col("_s").cast("double")), 6)
          .as("burst6"))
  }

  /** Exponentially time-decayed score per key at a common horizon:
    *   score(key) = Σ_i value_i · exp(−(T − t_i)/τ),
    * T = the stream's max timestamp (one broadcast scalar), τ the
    * half-life scale in seconds — the recency-weighted activity
    * score a ranking/engagement pipeline reads instead of a raw
    * count. Evaluating every event against the SAME horizon (not a
    * per-event running EWMA) is what makes this one aggregation
    * instead of an ordered scan: each term is independent, so the
    * whole thing is a map-side-combinable sum, and two snapshots at
    * horizons T1 < T2 reconcile by score·exp(−(T2−T1)/τ) + delta —
    * the incremental-maintenance property a running formulation
    * loses.
    *
    * Determinism: each term (one exp, one multiply) rounds to integer
    * MICRO-units BEFORE the sum — order-independent BIGINT addition,
    * the same convention as [[graft.operators.Profile.entropy]]. The
    * micro (not nano) grid is deliberate: exp() may differ by 1 ulp
    * across engines (relative ~1e-16, absolute ~1e-14 on these
    * magnitudes), so the rounding grid must sit orders of magnitude
    * above that wobble for the per-term round to land identically —
    * at 1e-6 the per-term flip probability is ~1e-8. One division at
    * the end, rounded to 6 (micro-quantized by construction). */
  def decayScore(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tauSec: Double): DataFrame = {
    val horizon = events.agg(max(unix_micros(col(tsCol))).as("_T"))
    events
      .crossJoin(broadcast(horizon)) // 1-row stream scalar
      .withColumn("_t", round(col(valueCol).cast("double") *
        exp((unix_micros(col(tsCol)) - col("_T")).cast("double")
          / lit(tauSec * 1e6)) * lit(1e6)).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("_t")).cast("double") / lit(1e6), 6).as("decayed6"))
  }
}
