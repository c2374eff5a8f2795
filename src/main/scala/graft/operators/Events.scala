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
}
