package graft.streaming

import graft.SparkSpec
import graft.operators.TextDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {

  private val base = "spark shuffles data across partitions during wide " +
    "transformations and joins while narrow transformations stay pipelined"
  private val nearDup = base.replace("joins", "unions")
  private val unrelated = "completely different content about birds nesting " +
    "in spring gardens with flowers blooming and insects buzzing everywhere"

  test("near-dup candidates surface across micro-batches via bucket state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupCandidates(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: the original and an unrelated doc — no pairs yet
      mem.addData((1L, base), (3L, unrelated))
      q.processAllAvailable()
      assert(sp.sql("SELECT * FROM sdedup").count() === 0)
      // batch 2: a near-dup arrives LATER — state must remember doc 1
      mem.addData((2L, nearDup))
      q.processAllAvailable()
      val pairs = sp.sql("SELECT DISTINCT docId, matchedDocId FROM sdedup")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((2L, 1L)))
    } finally q.stop()
  }

  test("exact streaming dedup keeps first arrival per etag") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val out = StreamingDedup.exactDedup(
      mem.toDF.toDF("ts", "etag", "text"), "etag", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("sexact")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:05:00")
      mem.addData((t0, "e1", "a"), (t0, "e2", "b"))
      q.processAllAvailable()
      mem.addData((t1, "e1", "a-again"), (t1, "e3", "c"))
      q.processAllAvailable()
      val kept = sp.sql("SELECT etag FROM sexact").collect().map(_.getString(0))
      assert(kept.sorted === Seq("e1", "e2", "e3"))
    } finally q.stop()
  }

  test("batch mode agrees with the batch lshCandidates operator") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
      .toDF("doc_id", "text")
    val streaming = StreamingDedup.nearDupCandidates(docs, "doc_id", "text")
      .select(least(col("docId"), col("matchedDocId")).as("d1"),
        greatest(col("docId"), col("matchedDocId")).as("d2"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = docs.select(col("doc_id"),
      graft.functions.NativeText.minhashSig(split(col("text"), " "), 3).as("sig"))
    val batch = TextDedup.lshCandidates(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streaming === batch)
  }

  test("hot buckets stop accumulating state and emitting pairs at the cap") {
    val sp = spark
    import sp.implicits._
    // 6 identical docs with cap 3: occupants 3, pairs only among them
    val docs = (1L to 6L).map(i => (i, base)).toDF("doc_id", "text")
    val out = StreamingDedup.nearDupCandidates(docs, "doc_id", "text",
        maxBucketOccupants = 3)
      .select(least(col("docId"), col("matchedDocId")).as("d1"),
        greatest(col("docId"), col("matchedDocId")).as("d2"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
