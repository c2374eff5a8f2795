package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingMonitorsSpec extends SparkSpec {

  /** Keyed-state row count from the query's most recent progress that
    * carries state metrics (no-data batches after a watermark advance
    * are where timeout evictions land). */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty => p.stateOperators(0).numRowsTotal
    }.getOrElse(-1L)

  test("throttle: watermark-driven eviction drops expired keys (state " +
      "rows shrink) and an in-horizon revival is still kept — lossless") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val out = StreamingMonitors.throttle(
      mem.toDF.toDF("key", "typ", "tsUs", "id"), windowSec = 60L)
    val q = out.writeStream.format("memory").queryName("thrttl")
      .outputMode(OutputMode.Append).start()
    try {
      val base = 3600000000L
      mem.addData(("u", "click", base, 1L))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      // a different key 2h later advances the watermark far past u's
      // lastKept + window → u's state is provably dead and must evict
      mem.addData(("w", "click", base + 7200000000L, 2L))
      q.processAllAvailable()
      // one more empty-ish advance so the timeout batch definitely ran
      mem.addData(("w", "click", base + 7300000000L, 3L))
      q.processAllAvailable()
      assert(stateRows(q) <= 2L,
        s"u's expired state should be evicted, got ${stateRows(q)} rows")
      // revival: u reappears — with or without state the event is ≥60s
      // past anything u ever kept, so it MUST be kept (lossless eviction)
      mem.addData(("u", "click", base + 7400000000L, 4L))
      q.processAllAvailable()
      val kept = sp.sql("SELECT id FROM thrttl").collect()
        .map(_.getLong(0)).toSet
      // 3 is 100s past w's kept 2 → kept; 4 is u's lossless revival
      assert(kept === Set(1L, 2L, 3L, 4L),
        "eviction must not change in-horizon keep decisions")
    } finally q.stop()
  }

  test("runningDrift: a window's category map evicts once the watermark " +
      "passes its end; earlier emissions unaffected") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val ref = Map("a" -> 1L)
    val mem = MemoryStream[(Long, String)]
    val out = StreamingMonitors.runningDrift(
      mem.toDF.toDF("tsUs", "cat"), windowSec = 60L, reference = ref)
    val q = out.writeStream.format("memory").queryName("drfttl")
      .outputMode(OutputMode.Append).start()
    try {
      val base = 3600000000L
      mem.addData((base, "a"), (base + 1000000L, "b"))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      // jump 2h: watermark passes the first window's end → evict it;
      // the new window's state replaces it
      mem.addData((base + 7200000000L, "a"))
      q.processAllAvailable()
      mem.addData((base + 7300000000L, "a"))
      q.processAllAvailable()
      assert(stateRows(q) <= 2L,
        s"expired window state should be gone, got ${stateRows(q)} rows")
      // the first window's last emission (from before eviction) stands
      val w0 = sp.sql(s"SELECT nA FROM drfttl WHERE windowStartUs = $base")
        .collect().map(_.getLong(0))
      assert(w0.nonEmpty && w0.max === 2L)
    } finally q.stop()
  }

  test("runningDecay: opt-in idle TTL evicts a dormant key; None keeps " +
      "the lifetime contract (state never drops)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingMonitors.runningDecay(
      mem.toDF.toDF("key", "tsUs", "value"), tauSec = 60.0,
      idleTtlSec = Some(600L))
    val q = out.writeStream.format("memory").queryName("decttl")
      .outputMode(OutputMode.Append).start()
    try {
      val base = 3600000000L
      mem.addData(("u", base, 10.0))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      // v's activity 2h on pushes the watermark past u's horizon+TTL
      mem.addData(("v", base + 7200000000L, 5.0))
      q.processAllAvailable()
      mem.addData(("v", base + 7300000000L, 5.0))
      q.processAllAvailable()
      assert(stateRows(q) <= 2L,
        s"dormant u should be evicted, got ${stateRows(q)} rows")
      // a revived u restarts from zero — the documented retention trade
      mem.addData(("u", base + 7400000000L, 3.0))
      q.processAllAvailable()
      val uLast = sp.sql(
          "SELECT score, nEvents FROM decttl WHERE key = 'u' " +
          "ORDER BY horizonUs DESC LIMIT 1").head()
      assert(uLast.getLong(1) === 1L, "revived key restarts its count")
      assert(math.abs(uLast.getDouble(0) - 3.0) < 1e-9)
    } finally q.stop()
  }

  test("runningScd2: opt-in idle TTL drops a dormant entity's open " +
      "interval; revival emits a fresh open interval") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, Long, Long, String)]
    val out = StreamingMonitors.runningScd2(
      mem.toDF.toDF("key", "tsUs", "id", "state"),
      idleTtlSec = Some(600L))
    val q = out.writeStream.format("memory").queryName("scdttl")
      .outputMode(OutputMode.Append).start()
    try {
      val base = 3600000000L
      mem.addData(("u", base, 1L, "free"))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      mem.addData(("v", base + 7200000000L, 2L, "pro"))
      q.processAllAvailable()
      mem.addData(("v", base + 7300000000L, 3L, "pro"))
      q.processAllAvailable()
      assert(stateRows(q) <= 2L,
        s"dormant u should be evicted, got ${stateRows(q)} rows")
      // revival with the SAME state value still opens a fresh interval
      // (state was forgotten) — the documented dimension-retention trade
      mem.addData(("u", base + 7400000000L, 4L, "free"))
      q.processAllAvailable()
      val uOpens = sp.sql(
          "SELECT validFromUs FROM scdttl WHERE key = 'u' " +
          "AND validToUs IS NULL").collect().map(_.getLong(0)).toSet
      assert(uOpens === Set(base, base + 7400000000L))
    } finally q.stop()
  }

  test("throttle: rate-limits against the last KEPT event across " +
      "micro-batches — the dialect the batch debounce can't express") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val out = StreamingMonitors.throttle(
      mem.toDF.toDF("key", "typ", "tsUs", "id"), windowSec = 60L)
    val q = out.writeStream.format("memory").queryName("thr")
      .outputMode(OutputMode.Append).start()
    try {
      // timestamps sit 1h off epoch: the event-time-timeout operator
      // drops rows at-or-below the watermark, and the watermark starts
      // at 0, so a literal t=0 first row would be degenerate-late
      val base = 3600000000L
      // t=+0 kept; t=+30 rejected; t=+70: within 60 of the REJECTED 30
      // but ≥60 past the KEPT +0 → KEPT here (batch gap-debounce would
      // drop it: its gap from the previous raw event is 40 < 60)
      mem.addData(("u", "click", base, 1L),
        ("u", "click", base + 30000000L, 2L),
        ("u", "click", base + 70000000L, 3L))
      q.processAllAvailable()
      // state carries across batches: +100 is only 30 past kept +70
      mem.addData(("u", "click", base + 100000000L, 4L))
      q.processAllAvailable()
      // independent (key, type) stream unaffected
      mem.addData(("u", "view", base + 101000000L, 5L))
      q.processAllAvailable()
      val kept = sp.sql("SELECT id FROM thr").collect()
        .map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("throttle: batch-mode contrast with gap-debounce on the same rows") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(("u", "x", 0L, 1L), ("u", "x", 30000000L, 2L),
      ("u", "x", 70000000L, 3L))
    val throttled = StreamingMonitors.throttle(
        rows.toDF("key", "typ", "tsUs", "id"), 60L)
      .collect().map(_.id).toSet
    assert(throttled === Set(1L, 3L))
    // the batch gap-session debounce on identical data drops id 3
    val ev = rows.map { case (k, t, us, id) =>
      (k, t, new java.sql.Timestamp(us / 1000L), id) }
      .toDF("key", "typ", "ts", "id")
    val gapKept = graft.operators.Events.debounce(ev, "key", "typ", "ts",
      "id", 60L).select("id").collect().map(_.getLong(0)).toSet
    assert(gapKept === Set(1L))
  }

  test("runningDecay: incremental snapshots reconcile to the batch " +
      "decayScore over all rows so far") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val tau = 3600.0
    val b1 = Seq(("u", 0L, 10.0), ("u", 3600000000L, 20.0))
    val b2 = Seq(("u", 7200000000L, 40.0), ("u", 5400000000L, 8.0))
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingMonitors.runningDecay(
      mem.toDF.toDF("key", "tsUs", "value"), tau)
    val q = out.writeStream.format("memory").queryName("dec")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val snaps = sp.sql("SELECT horizonUs, score, nEvents FROM dec")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(snaps.length === 2)
      // final snapshot vs batch operator over the union
      val ev = (b1 ++ b2).map { case (k, us, v) =>
        (k, new java.sql.Timestamp(us / 1000L), v) }
        .toDF("key", "ts", "value")
      val batch = graft.operators.Events.decayScore(ev, "key", "ts",
        "value", tau).head()
      val (h2, s2, n2) = snaps.maxBy(_._1)
      assert(n2 === 4L && h2 === 7200000000L)
      assert(math.abs(s2 - batch.getAs[Double]("decayed6")) < 1e-3,
        s"incremental $s2 vs batch ${batch.getAs[Double]("decayed6")}")
      // and vs the closed form directly
      val expect = 10.0 * math.exp(-2.0) + 20.0 * math.exp(-1.0) +
        8.0 * math.exp(-0.5) + 40.0
      assert(math.abs(s2 - expect) < 1e-6)
    } finally q.stop()
  }

  test("runningScd2: upserted interval set equals the batch " +
      "stateIntervals over an in-order stream; state survives batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, Long, Long, String)]
    val out = StreamingMonitors.runningScd2(
      mem.toDF.toDF("key", "tsUs", "id", "state"))
    val q = out.writeStream.format("memory").queryName("scd")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("u", 1000000L, 1L, "free"), ("u", 2000000L, 2L, "free"),
        ("u", 3000000L, 3L, "paid"))
      q.processAllAvailable()
      // next batch: change back — must close the 'paid' interval opened
      // in the PREVIOUS batch (state carried)
      mem.addData(("u", 5000000L, 4L, "free"), ("v", 9000000L, 5L, "pro"))
      q.processAllAvailable()
      // consumer upsert: latest emission per (key, validFromUs) wins
      val rows = sp.sql(
          "SELECT key, state, validFromUs, validToUs FROM scd").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
      val upserted = rows.groupBy(r => (r._1, r._3))
        .map(_._2.last).toSet
      // batch twin over the union of all rows
      val ev = Seq(
        ("u", new java.sql.Timestamp(1000L), 1L, "free"),
        ("u", new java.sql.Timestamp(2000L), 2L, "free"),
        ("u", new java.sql.Timestamp(3000L), 3L, "paid"),
        ("u", new java.sql.Timestamp(5000L), 4L, "free"),
        ("v", new java.sql.Timestamp(9000L), 5L, "pro")
      ).toDF("key", "ts", "id", "state")
      val batch = graft.operators.Events.stateIntervals(ev, "key", "ts",
          "id", "state")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getTimestamp(2).getTime * 1000L,
          Option(r.getTimestamp(3)).map(_.getTime * 1000L))).toSet
      assert(upserted === batch)
    } finally q.stop()
  }

  test("runningDrift: per-window snapshots; final window tv6 equals the " +
      "batch categoryDrift on that window's rows") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val ref = Map("a" -> 6L, "b" -> 4L)
    val mem = MemoryStream[(Long, String)]
    val out = StreamingMonitors.runningDrift(
      mem.toDF.toDF("tsUs", "cat"), windowSec = 60L, reference = ref)
    val q = out.writeStream.format("memory").queryName("drf")
      .outputMode(OutputMode.Append).start()
    try {
      // timestamps sit 1h off epoch (see throttle test); window starts
      // land on the hour boundary and the hour+60s boundary
      val base = 3600000000L
      // first window: starts matching the reference, then drifts to all-b
      mem.addData((base, "a"), (base + 1000000L, "a"),
        (base + 2000000L, "a"),
        (base + 3000000L, "b"), (base + 4000000L, "b"))
      q.processAllAvailable()
      mem.addData((base + 5000000L, "b"), (base + 6000000L, "b"),
        (base + 7000000L, "b"),
        // second window opens in the same batch
        (base + 61000000L, "a"))
      q.processAllAvailable()
      val rows = sp.sql("SELECT windowStartUs, nA, tv6 FROM drf")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // window 0 emitted twice (changed in both batches), window 1 once
      assert(rows.count(_._1 == base) === 2)
      assert(rows.count(_._1 == base + 60000000L) === 1)
      val w0Final = rows.filter(_._1 == base).maxBy(_._2)
      // batch cross-check on window 0's final mix: a=3,b=5 vs ref 6/4
      val a = (Seq.fill(3)("a") ++ Seq.fill(5)("b")).toDF("c")
      val b = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).toDF("c")
      val batchTv = graft.operators.Profile.categoryDrift(a, b, "c")
        .head().getAs[Double]("tv6")
      assert(w0Final._3 === batchTv)
      // tv = ½(|3/8−6/10| + |5/8−4/10|) = 0.225
      assert(w0Final._3 === 0.225)
    } finally q.stop()
  }
}
