package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingMonitorsSpec extends SparkSpec {

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
      // t=0 kept; t=30 rejected; t=70: within 60 of the REJECTED 30
      // but ≥60 past the KEPT 0 → KEPT here (batch gap-debounce would
      // drop it: its gap from the previous raw event is 40 < 60)
      mem.addData(("u", "click", 0L, 1L), ("u", "click", 30000000L, 2L),
        ("u", "click", 70000000L, 3L))
      q.processAllAvailable()
      // state carries across batches: t=100 is only 30 past kept t=70
      mem.addData(("u", "click", 100000000L, 4L))
      q.processAllAvailable()
      // independent (key, type) stream unaffected
      mem.addData(("u", "view", 101000000L, 5L))
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
      // window 0: starts matching the reference, then drifts to all-b
      mem.addData((0L, "a"), (1000000L, "a"), (2000000L, "a"),
        (3000000L, "b"), (4000000L, "b"))
      q.processAllAvailable()
      mem.addData((5000000L, "b"), (6000000L, "b"), (7000000L, "b"),
        // window 1 opens in the same batch
        (61000000L, "a"))
      q.processAllAvailable()
      val rows = sp.sql("SELECT windowStartUs, nA, tv6 FROM drf")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // window 0 emitted twice (changed in both batches), window 1 once
      assert(rows.count(_._1 == 0L) === 2)
      assert(rows.count(_._1 == 60000000L) === 1)
      val w0Final = rows.filter(_._1 == 0L).maxBy(_._2)
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
