package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermark-driven state-TTL pins for the round-14 sweep of the
  * remaining NoTimeout keyed-state ops (the monitors' TTLs are pinned
  * in StreamingMonitorsSpec): expired state is GONE once the watermark
  * passes the retention horizon, and in-horizon results are unchanged
  * relative to the lifetime-state form. */
class StreamingTtlSpec extends SparkSpec {

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty => p.stateOperators(0).numRowsTotal
    }.getOrElse(-1L)

  private val base = "spark shuffles data across partitions during wide " +
    "transformations and joins while narrow transformations stay pipelined"
  private val nearDup = base.replace("joins", "unions")

  test("nearDupCandidates retention: an occupant older than the " +
      "retention horizon stops pairing and its buckets evict") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingDedup.nearDupCandidates(
      mem.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text",
      tsCol = Some("ts"), retentionSec = 3600L)
    val q = out.writeStream.format("memory").queryName("sdttl")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
      val t0 = 100000L
      mem.addData((1L, base, ts(t0)))
      q.processAllAvailable()
      val rowsWithDoc1 = stateRows(q)
      assert(rowsWithDoc1 > 0L)
      // advance the WATERMARK 3h past doc 1 first (retention is
      // watermark-relative and the watermark lags one batch), via an
      // unrelated doc that shares no buckets
      mem.addData((3L, "unrelated words entirely about gardens and " +
        "birds nesting quietly in spring sunshine every single day",
        ts(t0 + 10800L)))
      q.processAllAvailable()
      // now the near-dup arrives — doc 1 sits outside the 1h retention
      // horizon of the current watermark, so NO pair may form
      mem.addData((2L, nearDup, ts(t0 + 10900L)))
      q.processAllAvailable()
      assert(sp.sql("SELECT * FROM sdttl").count() === 0,
        "expired occupants must not yield candidates")
      // doc 1's idle buckets have been evicted: state now holds only
      // docs 2 and 3's buckets (one doc's band count each)
      assert(stateRows(q) <= 2 * rowsWithDoc1,
        s"doc 1's buckets should be gone, got ${stateRows(q)}")
      // an in-horizon near-dup still pairs against doc 2
      mem.addData((4L, nearDup + " tail", ts(t0 + 11000L)))
      q.processAllAvailable()
      val pairs = sp.sql("SELECT DISTINCT docId, matchedDocId FROM sdttl")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((4L, 2L)))
    } finally q.stop()
  }

  test("runningHeavyHitters idle TTL: dormant group's counters evict; " +
      "revival restarts; None keeps lifetime behavior") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val out = StreamingHeavyHitters.runningHeavyHitters(
      mem.toDF.toDF("group", "key", "ts"), capacity = 4,
      tsCol = Some("ts"), idleTtlSec = 600L)
    val q = out.writeStream.format("memory").queryName("hhttl")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
      val t0 = 100000L
      mem.addData(("g1", "a", ts(t0)), ("g1", "a", ts(t0 + 1)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      // g2's activity 2h on evicts dormant g1
      mem.addData(("g2", "x", ts(t0 + 7200L)))
      q.processAllAvailable()
      mem.addData(("g2", "x", ts(t0 + 7300L)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L,
        s"dormant g1 should be evicted, got ${stateRows(q)}")
      // revived g1 restarts its counters from zero
      mem.addData(("g1", "b", ts(t0 + 7400L)))
      q.processAllAvailable()
      val g1Last = sp.sql(
        "SELECT key, cnt FROM hhttl WHERE group = 'g1' ORDER BY cnt DESC")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(g1Last.contains(("b", 1L)) && !g1Last.contains(("a", 3L)))
    } finally q.stop()
  }

  test("runningTopK idle TTL: dormant leaderboard evicts and rebuilds " +
      "from post-revival arrivals only") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, Long, Double, java.sql.Timestamp)]
    val out = StreamingTopK.runningTopK(
      mem.toDF.toDF("group", "id", "score", "ts"), k = 2,
      tsCol = Some("ts"), idleTtlSec = 600L)
    val q = out.writeStream.format("memory").queryName("tkttl")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
      val t0 = 100000L
      mem.addData(("g", 1L, 0.1, ts(t0)), ("g", 2L, 0.2, ts(t0)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      mem.addData(("h", 9L, 0.9, ts(t0 + 7200L)))
      q.processAllAvailable()
      mem.addData(("h", 8L, 0.8, ts(t0 + 7300L)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L,
        s"dormant g should be evicted, got ${stateRows(q)}")
      // post-revival: id 3 ranks 1 in a FRESH leaderboard (1 and 2
      // forgotten) even though its score is worse than theirs — with
      // surviving state it would rank 3rd of k=2 and never be emitted
      mem.addData(("g", 3L, 0.5, ts(t0 + 7400L)))
      q.processAllAvailable()
      val id3Ranks = sp.sql(
        "SELECT rank FROM tkttl WHERE group = 'g' AND id = 3")
        .collect().map(_.getInt(0)).toSeq
      assert(id3Ranks === Seq(1))
    } finally q.stop()
  }

  test("fetchGate idle TTL: an idle url's state evicts; on revival it " +
      "reads as never-checked (due) — the reference's NULL last_status") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[StreamOps.FetchEvent]
    val q = StreamOps.fetchGate(mem.toDS(),
        idleTtlMs = Some(3600L * 1000L))
      .writeStream.format("memory").queryName("fgttl")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(StreamOps.FetchEvent("http://a", 200,
        ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(stateRows(q) === 1L)
      mem.addData(StreamOps.FetchEvent("http://b", 200,
        ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      mem.addData(StreamOps.FetchEvent("http://b", 200,
        ts("2024-01-02 11:30:00")))
      q.processAllAvailable()
      assert(stateRows(q) === 1L,
        s"idle url a should be evicted, got ${stateRows(q)}")
      // revived url a: failure streak restarted (1, not a continuation)
      mem.addData(StreamOps.FetchEvent("http://a", 500,
        ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      val aLast = sp.sql(
        "SELECT failures FROM fgttl WHERE url = 'http://a' " +
        "ORDER BY failures DESC").collect().map(_.getInt(0))
      assert(aLast.head === 1)
    } finally q.stop()
  }
}
