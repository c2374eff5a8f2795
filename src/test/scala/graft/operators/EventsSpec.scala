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

  test("stateIntervals: collapses equal-state runs; valid_to chains to " +
      "the next run; last run open") {
    val s2 = spark
    import s2.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, "free"),
      (1L, ts("2024-01-01 10:00:00"), 11L, "free"),
      (1L, ts("2024-01-01 11:00:00"), 12L, "paid"),
      (1L, ts("2024-01-01 12:00:00"), 13L, "paid"),
      (1L, ts("2024-01-01 13:00:00"), 14L, "free"),
      (2L, ts("2024-01-01 09:30:00"), 20L, "paid")
    ).toDF("user_id", "ts", "event_id", "state")
    val got = Events.stateIntervals(ev, "user_id", "ts", "event_id", "state")
      .orderBy(col("user_id"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(got.toSeq === Seq(
      (1L, "free", ts("2024-01-01 09:00:00"), Some(ts("2024-01-01 11:00:00"))),
      (1L, "paid", ts("2024-01-01 11:00:00"), Some(ts("2024-01-01 13:00:00"))),
      (1L, "free", ts("2024-01-01 13:00:00"), None),
      (2L, "paid", ts("2024-01-01 09:30:00"), None)))
  }

  test("stateIntervals: equal-ts ties order by the tie column") {
    val s2 = spark
    import s2.implicits._
    // same ts, ids 2 then 1: run order must follow event_id — state b
    // (id 1) first, then a (id 2); a stays current
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 2L, "a"),
      (1L, ts("2024-01-01 09:00:00"), 1L, "b")
    ).toDF("user_id", "ts", "event_id", "state")
    val got = Events.stateIntervals(ev, "user_id", "ts", "event_id", "state")
      .orderBy(col("valid_from"), col("state"))
      .collect().map(r => (r.getString(1), Option(r.getTimestamp(3))))
    assert(got.toSet === Set(
      ("b", Some(ts("2024-01-01 09:00:00"))), ("a", None)))
  }

  test("debounce: keeps gap-session heads per (key, type); " +
      "independent types don't interfere; idempotent") {
    val s2 = spark
    import s2.implicits._
    val ev = Seq(
      // burst: 09:00:00, +30s, +45s (gaps 30, 15 <= 60) — one head
      (1L, ts("2024-01-01 09:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 09:00:30"), 2L, "click"),
      (1L, ts("2024-01-01 09:00:45"), 3L, "click"),
      // 61s after the last → new burst
      (1L, ts("2024-01-01 09:01:46"), 4L, "click"),
      // a view inside the click burst is its own stream — kept
      (1L, ts("2024-01-01 09:00:10"), 5L, "view"),
      // another user entirely
      (2L, ts("2024-01-01 09:00:20"), 6L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val kept = Events.debounce(ev, "user_id", "event_type", "ts",
        "event_id", windowSec = 60L)
    val ids = kept.select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 4L, 5L, 6L))
    // idempotent: every kept row starts its own gap-session
    val again = Events.debounce(kept, "user_id", "event_type", "ts",
        "event_id", windowSec = 60L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(again === ids)
  }

  test("weeklyChurn: retained/fresh/churned partition each week's " +
      "presence change; first week all fresh; phantom trailing week " +
      "dropped") {
    val s2 = spark
    import s2.implicits._
    // week1 (Mon 2024-01-01): users 1,2,3; week2: 2,3,4,5; week3: 5
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-08 10:00:00")), (3L, ts("2024-01-09 10:00:00")),
      (4L, ts("2024-01-10 10:00:00")), (5L, ts("2024-01-11 10:00:00")),
      (5L, ts("2024-01-15 10:00:00"))
    ).toDF("user_id", "ts")
    val r = Events.weeklyChurn(ev, "user_id", "ts")
      .collect().map(x => (x.getTimestamp(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.length === 3) // no phantom week after the last
    assert(r(0) === ((ts("2024-01-01 00:00:00"), 0L, 3L, 0L)))
    assert(r(1) === ((ts("2024-01-08 00:00:00"), 2L, 2L, 1L)))
    assert(r(2) === ((ts("2024-01-15 00:00:00"), 1L, 0L, 3L)))
  }

  test("ohlcBars: open/close follow the (ts, id) order incl. equal-ts " +
      "ties; high/low are extremes; one row per (key, day)") {
    val s2 = spark
    import s2.implicits._
    val ev = Seq(
      ("x", ts("2024-01-01 09:00:00"), 1L, 50L),
      ("x", ts("2024-01-01 09:00:00"), 2L, 60L), // tie: id 1 is open
      ("x", ts("2024-01-01 12:00:00"), 3L, 10L),
      ("x", ts("2024-01-01 15:00:00"), 4L, 55L),
      ("x", ts("2024-01-02 09:00:00"), 5L, 99L)
    ).toDF("k", "ts", "id", "v")
    val r = Events.ohlcBars(ev, "k", "ts", "id", "v")
      .orderBy(col("day")).collect()
      .map(x => (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
        x.getLong(6)))
    assert(r(0) === ((50L, 60L, 10L, 55L, 4L)))
    assert(r(1) === ((99L, 99L, 99L, 99L, 1L)))
  }

  test("calendarGaps: span/active/gap arithmetic; dense key reads 0 gaps") {
    val s2 = spark
    import s2.implicits._
    // u1: days 1,2,3 (dense); u2: days 1, 5 (3 gaps); u3: one day
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-03 23:00:00")), (1L, ts("2024-01-03 01:00:00")),
      (2L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-05 09:00:00")),
      (3L, ts("2024-02-01 12:00:00"))
    ).toDF("user_id", "ts")
    val r = Events.calendarGaps(ev, "user_id", "ts")
      .collect().map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4),
        x.getLong(5))).toMap
    assert(r(1L) === ((3L, 3L, 0L)))
    assert(r(2L) === ((2L, 5L, 3L)))
    assert(r(3L) === ((1L, 1L, 0L)))
  }

  test("weeklyChurn + calendarGaps + ohlcBars: fresh-seed randomized " +
      "battery against brute-force set arithmetic") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(67)
    // random events over 5 weeks x 12 users
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (1 to 600).map { i =>
      val u = rnd.nextInt(12).toLong
      val t = new java.sql.Timestamp(base +
        rnd.nextInt(35) * 86400000L + rnd.nextInt(86400000))
      (u, t, i.toLong, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("user_id", "ts", "id", "v")
    // churn brute
    def week(t: java.sql.Timestamp): Long =
      (t.getTime - base) / (7 * 86400000L) // base is a Monday
    val active = rows.map(r => (r._1, week(r._2))).toSet
    val weeks = active.map(_._2)
    val churnGot = Events.weeklyChurn(df, "user_id", "ts")
      .collect().map(x => week(x.getTimestamp(0)) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    weeks.foreach { w =>
      val cur = active.filter(_._2 == w).map(_._1)
      val prv = active.filter(_._2 == w - 1).map(_._1)
      assert(churnGot(w) === ((cur.intersect(prv).size.toLong,
        (cur -- prv).size.toLong, (prv -- cur).size.toLong)), s"week $w")
    }
    // gaps brute
    val gapsGot = Events.calendarGaps(df, "user_id", "ts")
      .collect().map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4),
        x.getLong(5))).toMap
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val days = rs.map(r => (r._2.getTime - base) / 86400000L).toSet
      val span = days.max - days.min + 1
      assert(gapsGot(u) === ((days.size.toLong, span, span - days.size)),
        s"user $u")
    }
    // ohlc brute per (user, day)
    val ohlcGot = Events.ohlcBars(df, "user_id", "ts", "id", "v")
      .collect().map(x => (x.getLong(0),
        (x.getTimestamp(1).getTime - base) / 86400000L) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))).toMap
    rows.groupBy(r => (r._1, (r._2.getTime - base) / 86400000L))
      .foreach { case (k, rs) =>
        val ord = rs.sortBy(r => (r._2.getTime, r._3))
        assert(ohlcGot(k) === ((ord.head._4, rs.map(_._4).max,
          rs.map(_._4).min, ord.last._4)), s"cell $k")
      }
  }

  test("burstiness: metronome reads -1-ish negative... exactly 0 gap " +
      "variance -> B = -1; bursty tail pushes B positive") {
    val s2 = spark
    import s2.implicits._
    // user 1: perfectly regular 60s gaps (σ=0 → B = (0−μ)/(0+μ) = −1)
    // user 2: ten 1s gaps + one huge 10000s gap → heavy burst, B > 0
    val reg = (0 to 11).map(i =>
      (1L, new java.sql.Timestamp(1700000000000L + i * 60000L)))
    val bur = (0 to 10).map(i =>
      (2L, new java.sql.Timestamp(1700000000000L + i * 1000L))) :+
      ((2L, new java.sql.Timestamp(1700000000000L + 10000000L + 10000L)))
    val ev = (reg ++ bur).toDF("user_id", "ts")
    val r = Events.burstiness(ev, "user_id", "ts", minGaps = 10)
      .collect().map(x => x.getLong(0) -> (x.getLong(1),
        x.getDouble(2))).toMap
    assert(r(1L)._1 === 11L)
    assert(r(1L)._2 === -1.0)
    assert(r(2L)._2 > 0.4, s"bursty user read ${r(2L)._2}")
    // closed form for user 2: gaps = ten 1s + one 10000s ->
    // s=10010, q=100000010, B = (sqrt(11q - s^2) - s)/(sqrt + s)
    val rad = 11.0 * 100000010.0 - 10010.0 * 10010.0
    val expect = (math.sqrt(rad) - 10010.0) / (math.sqrt(rad) + 10010.0)
    assert(math.abs(r(2L)._2 - expect) < 1e-6)
  }

  test("stateIntervals + debounce: randomized battery vs brute-force " +
      "run/gap-session sweeps") {
    val s2 = spark
    import s2.implicits._
    for (seed <- Seq(21, 91)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 300).map { i =>
        (rnd.nextInt(5).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(200) * 30000L),
          i.toLong, s"s${rnd.nextInt(3)}")
      }
      val df = rows.toDF("k", "ts", "id", "st")
      // SCD2 brute
      val gotIv = Events.stateIntervals(df, "k", "ts", "id", "st")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime,
          Option(r.getTimestamp(3)).map(_.getTime))).toSet
      val bruteIv = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val ord = rs.sortBy(r => (r._2.getTime, r._3))
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long)]
        ord.foreach { r =>
          if (runs.isEmpty || runs.last._1 != r._4)
            runs += ((r._4, r._2.getTime))
        }
        runs.zipWithIndex.map { case ((st, from), i) =>
          (k, st, from,
            if (i + 1 < runs.size) Some(runs(i + 1)._2) else None)
        }
      }.toSet
      assert(gotIv === bruteIv, s"seed=$seed scd2")
      // debounce brute: gap-session heads per (k, st)
      val gotDb = Events.debounce(df, "k", "st", "ts", "id", 60L)
        .select("id").collect().map(_.getLong(0)).toSet
      val bruteDb = rows.groupBy(r => (r._1, r._4)).flatMap {
        case (_, rs) =>
          val ord = rs.sortBy(r => (r._2.getTime, r._3))
          ord.zipWithIndex.collect { case (r, i)
            if i == 0 ||
              r._2.getTime - ord(i - 1)._2.getTime > 60000L => r._3 }
      }.toSet
      assert(gotDb === bruteDb, s"seed=$seed debounce")
    }
  }

  test("decayScore: snapshot reconciliation in batch form — score over " +
      "all rows equals aged(first-half score) + second-half delta") {
    val s2 = spark
    import s2.implicits._
    val tau = 1800.0
    val rnd = new scala.util.Random(3)
    val rows = (1 to 200).map(i => (1L,
      new java.sql.Timestamp(1700000000000L + rnd.nextInt(7200) * 1000L),
      rnd.nextInt(50).toDouble))
    val df = rows.toDF("k", "ts", "v")
    val all = Events.decayScore(df, "k", "ts", "v", tau)
      .head().getAs[Double]("decayed6")
    val cut = 1700000000000L + 3600 * 1000L
    val (h1, h2) = rows.partition(_._2.getTime < cut)
    val s1 = Events.decayScore(h1.toDF("k", "ts", "v"), "k", "ts", "v",
      tau).head().getAs[Double]("decayed6")
    val t1 = h1.map(_._2.getTime).max
    val t2 = rows.map(_._2.getTime).max
    val aged = s1 * math.exp((t1 - t2) / 1000.0 / tau)
    val delta = h2.map(r =>
      r._3 * math.exp((r._2.getTime - t2) / 1000.0 / tau)).sum
    assert(math.abs(all - (aged + delta)) < 1e-3,
      s"$all vs ${aged + delta}")
  }

  test("decayScore: closed form at the horizon, order-independent, " +
      "snapshot reconciliation property") {
    val s2 = spark
    import s2.implicits._
    val tau = 3600.0
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0), // 2h before horizon
      (1L, ts("2024-01-01 10:00:00"), 20.0), // 1h before
      (1L, ts("2024-01-01 11:00:00"), 40.0), // at horizon
      (2L, ts("2024-01-01 11:00:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    val r = Events.decayScore(ev, "user_id", "ts", "value", tau)
      .collect().map(x => x.getLong(0) -> (x.getLong(1),
        x.getDouble(2))).toMap
    val expect1 = 10.0 * math.exp(-2.0) + 20.0 * math.exp(-1.0) + 40.0
    assert(r(1L)._1 === 3L)
    assert(math.abs(r(1L)._2 - expect1) < 1e-5)
    assert(r(2L) === ((1L, 5.0)))
    // partition-layout independence (the micro-unit integer sum)
    val again = Events.decayScore(ev.repartition(5), "user_id", "ts",
      "value", tau).collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(again(1L) === r(1L)._2 && again(2L) === r(2L)._2)
  }

  test("debounce: boundary gap exactly == window is still a burst") {
    val s2 = spark
    import s2.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "x"),
      (1L, ts("2024-01-01 09:01:00"), 2L, "x") // gap == 60s → same burst
    ).toDF("user_id", "ts", "event_id", "event_type")
    val ids = Events.debounce(ev, "user_id", "event_type", "ts",
        "event_id", 60L).select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }
}
