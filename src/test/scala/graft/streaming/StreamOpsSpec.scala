package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamOpsSpec extends SparkSpec {

  private def ts(x: String) = java.sql.Timestamp.valueOf(x)

  test("statsWindowed: event-time 1-day windows close under the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val events = mem.toDF().toDF("ts", "recordset", "stat_type")
    val q = StreamOps.statsWindowed(events, "1 hour")
      .writeStream.format("memory").queryName("stats_win")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "rs1", "search"),
        (ts("2024-01-01 11:00:00"), "rs1", "search"),
        (ts("2024-01-01 12:00:00"), "rs1", "view"),
        (ts("2024-01-02 09:00:00"), "rs2", "search"))
      q.processAllAvailable()
      // second batch advances the watermark past Jan-3, closing the
      // earlier windows so Append mode emits them exactly once
      mem.addData((ts("2024-01-03 12:00:00"), "rs2", "view"))
      q.processAllAvailable()
      val got = sp.sql("SELECT day, recordset, stat_type, n FROM stats_win")
        .collect().map(r => (r.getTimestamp(0).toString.take(10),
          r.getString(1), r.getString(2), r.getLong(3))).toSet
      assert(got.contains(("2024-01-01", "rs1", "search", 2L)))
      assert(got.contains(("2024-01-01", "rs1", "view", 1L)))
      assert(got.contains(("2024-01-02", "rs2", "search", 1L)))
    } finally q.stop()
  }

  test("fetchGate: per-url keyed state folds status + failure streak across batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[StreamOps.FetchEvent]
    val q = StreamOps.fetchGate(mem.toDS())
      .writeStream.format("memory").queryName("fetch_gate")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(
        StreamOps.FetchEvent("http://a/1.jpg", 200, ts("2024-01-01 10:00:00")),
        StreamOps.FetchEvent("http://a/2.jpg", 500, ts("2024-01-01 10:00:00")),
        StreamOps.FetchEvent("http://a/2.jpg", 404, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      val got = sp.sql("SELECT url, lastStatus, failures, due FROM fetch_gate")
        .collect().map(r => r.getString(0) ->
          ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
      // success resets the streak and is not due again
      assert(got("http://a/1.jpg") == ((200, 0, false)))
      // two consecutive failures; last_check is old -> due for recheck
      assert(got("http://a/2.jpg") == ((404, 2, true)))

      // next micro-batch: state persisted, streak continues; a success
      // on the other url keeps it at zero
      mem.addData(
        StreamOps.FetchEvent("http://a/2.jpg", 503, ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      val later = sp.sql(
        "SELECT failures FROM fetch_gate WHERE url='http://a/2.jpg'")
        .collect().map(_.getInt(0)).max
      assert(later == 3, "failure streak must carry across micro-batches")
    } finally q.stop()
  }

  test("sessionized: gap splits sessions, adjacent events merge, " +
      "watermark closes and emits once") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamOps.sessionized(
        mem.toDF().toDF("ts", "user"), "user",
        gap = "30 minutes", lateness = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        // u1: three events within 30-minute gaps = ONE session
        (ts("2024-01-01 10:00:00"), "u1"),
        (ts("2024-01-01 10:20:00"), "u1"),
        (ts("2024-01-01 10:45:00"), "u1"),
        // u1 again after a 2-hour gap = a SECOND session
        (ts("2024-01-01 13:00:00"), "u1"),
        // u2: lone event
        (ts("2024-01-01 10:05:00"), "u2"))
      q.processAllAvailable()
      // advance the watermark far past every session's close
      mem.addData((ts("2024-01-02 00:00:00"), "u3"))
      q.processAllAvailable()
      val got = sp.sql(
        "SELECT user, session_start, session_end, n_events FROM sessions")
        .collect().map(r => (r.getString(0),
          r.getTimestamp(1).toString, r.getTimestamp(2).toString,
          r.getLong(3))).toSet
      assert(got === Set(
        // session end = last event + gap
        ("u1", "2024-01-01 10:00:00.0", "2024-01-01 11:15:00.0", 3L),
        ("u1", "2024-01-01 13:00:00.0", "2024-01-01 13:30:00.0", 1L),
        ("u2", "2024-01-01 10:05:00.0", "2024-01-01 10:35:00.0", 1L)))
    } finally q.stop()
  }

  test("fetchCorrelate: interval join matches in-window results; " +
      "watermark emits timed-out requests with null outcome") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val reqMem = MemoryStream[(java.sql.Timestamp, String)]
    val resMem = MemoryStream[(java.sql.Timestamp, String, Int)]
    val q = StreamOps.fetchCorrelate(
        reqMem.toDF().toDF("req_ts", "req_url"),
        resMem.toDF().toDF("res_ts", "res_url", "status"),
        horizon = "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("correlate")
      .outputMode(OutputMode.Append())
      .start()
    try {
      reqMem.addData(
        (ts("2024-01-01 10:00:00"), "http://a"),
        (ts("2024-01-01 10:00:00"), "http://b"),   // will never answer
        (ts("2024-01-01 10:05:00"), "http://c"))
      resMem.addData(
        (ts("2024-01-01 10:10:00"), "http://a", 200),
        // same url but OUTSIDE http://c's 30-minute window
        (ts("2024-01-01 11:00:00"), "http://c", 500))
      q.processAllAvailable()
      // advance both watermarks far past every join window
      reqMem.addData((ts("2024-01-02 00:00:00"), "http://z"))
      resMem.addData((ts("2024-01-02 00:00:00"), "http://z", 200))
      q.processAllAvailable()
      val got = sp.sql(
        "SELECT req_url, status FROM correlate WHERE req_url != 'http://z'")
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
      assert(got === Set(
        ("http://a", 200),     // matched inside the window
        ("http://b", -1),      // no result ever: timeout row
        ("http://c", -1)))     // result came too late: timeout row
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicates inside the horizon drop, " +
      "state expires past it") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val q = StreamOps.dedupWithinWatermark(
        mem.toDF().toDF("ts", "etag", "payload"), Seq("etag"),
        lateness = "1 hour")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "e1", "first"),
        (ts("2024-01-01 10:10:00"), "e1", "resend"),
        (ts("2024-01-01 10:00:00"), "e2", "only"))
      q.processAllAvailable()
      // a second resend in a later batch, still within the horizon
      mem.addData((ts("2024-01-01 10:30:00"), "e1", "late-resend"))
      q.processAllAvailable()
      val inside = sp.sql("SELECT etag, payload FROM dedup_wm")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(inside === Set(("e1", "first"), ("e2", "only")),
        "every in-horizon duplicate must drop, first arrival wins")
      // push the watermark days past e1's arrival: its state expires,
      // so a far-future re-send of e1 emits again (the documented trade)
      mem.addData((ts("2024-01-05 00:00:00"), "advance", "wm"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-05 01:00:00"), "e1", "beyond-horizon"))
      q.processAllAvailable()
      val replay = sp.sql(
        "SELECT payload FROM dedup_wm WHERE payload = 'beyond-horizon'").count()
      assert(replay === 1L, "state must expire past the watermark horizon")
    } finally q.stop()
  }
}
