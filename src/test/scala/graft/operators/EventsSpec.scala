package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the batch event-analytics operators the
  * round-12 driver rows gate end-to-end: the oracle proves
  * engine-parity on the sf tables, these pin the SEMANTICS on inputs
  * small enough to verify by eye, plus the plan shape (sessionize is
  * one exchange on the key). */
class EventsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: gap strictly above threshold opens a session; " +
      "first event is session 0; keys are independent") {
    val s2 = spark
    import s2.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")),   // 20 min gap, same session
      (1L, ts("2024-01-01 11:20:00")),   // 60 min gap == threshold: SAME
      (1L, ts("2024-01-01 12:21:00")),   // 61 min: new session
      (2L, ts("2024-01-01 23:00:00"))    // other key starts at 0
    ).toDF("user_id", "ts")
    val got = Events.sessionize(ev, "user_id", "ts", gapMinutes = 60)
      .select(col("user_id"), col("ts"), col("session"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(got === Set(
      (1L, "2024-01-01 10:00:00.0", 0L),
      (1L, "2024-01-01 10:20:00.0", 0L),
      (1L, "2024-01-01 11:20:00.0", 0L),
      (1L, "2024-01-01 12:21:00.0", 1L),
      (2L, "2024-01-01 23:00:00.0", 0L)))
  }

  test("sessionize plan: exactly one Exchange (the key partitioning)") {
    val s2 = spark
    import s2.implicits._
    // parquet-backed so the plan is a real scan, not a LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
      .write.mode("overwrite").parquet(dir)
    val plan = Events.sessionize(s2.read.parquet(dir), "user_id", "ts", 60)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    assert(exchanges === 1, plan)
  }

  test("funnel: strict ordering, null chain, depth counts") {
    val s2 = spark
    import s2.implicits._
    val ev = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 2: purchase BEFORE the first view -> depth stops at view
      (2L, ts("2024-01-01 08:00:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      // user 3: click at the exact same instant as view -> NOT strictly
      // after -> depth 1
      (3L, ts("2024-01-01 09:00:00"), "view"),
      (3L, ts("2024-01-01 09:00:00"), "click"),
      // user 4: no view at all -> absent from the funnel
      (4L, ts("2024-01-01 09:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("depth"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("funnel picks the EARLIEST qualifying time per step, not any") {
    val s2 = spark
    import s2.implicits._
    // two clicks after the view; the earlier one gates the purchase
    // window, so a purchase between the clicks still completes depth 3
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("depth")).head().getInt(0)
    assert(got === 3)
  }
}
