package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingTopKSpec extends SparkSpec {

  test("running top-k refreshes per group as better rows stream in") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val out = StreamingTopK.runningTopK(
      mem.toDF.toDF("group", "id", "score"), k = 2)
    val q = out.writeStream.format("memory").queryName("stopk")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(("g1", 10L, 5.0), ("g1", 11L, 3.0), ("g1", 12L, 9.0),
        ("g2", 20L, 1.0))
      q.processAllAvailable()
      val snap1 = sp.sql(
          "SELECT group, id, rank FROM stopk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      // g1 keeps its two best (3.0, 5.0); 9.0 never enters
      assert(snap1 === Set(("g1", 11L, 1), ("g1", 10L, 2), ("g2", 20L, 1)))

      // batch 2: a better row displaces g1's second place; g2 unchanged
      // rows (worse than kept) must NOT re-emit
      mem.addData(("g1", 13L, 1.0), ("g2", 21L, 7.0))
      q.processAllAvailable()
      val all = sp.sql("SELECT group, id, rank FROM stopk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      // 12 (9.0) never entered any snapshot
      assert(!all.exists(_._2 == 12L))
      // the refreshed g1 snapshot: 13 (1.0) at rank 1, 11 re-ranked to 2
      assert(all.count(t => t == (("g1", 13L, 1))) === 1)
      assert(all.contains(("g1", 11L, 2)), "11 re-emitted at its new rank")
      // g2: the 7.0 arrival still fits (k=2) → refreshed snapshot emitted
      assert(all.contains(("g2", 21L, 2)))
    } finally q.stop()
  }

  test("batch mode equals the batch heap operator") {
    val sp = spark
    import sp.implicits._
    val rows = Seq(
      ("a", 1L, 4.0), ("a", 2L, 2.0), ("a", 3L, 8.0), ("a", 4L, 1.0),
      ("b", 5L, 3.0), ("b", 6L, 6.0))
    val streaming = StreamingTopK.runningTopK(
        rows.toDF("group", "id", "score"), k = 3)
      .collect().map(r => (r.group, r.id, r.rank)).toSet
    val batch = graft.plans.TopKPerGroup.topK(
        rows.toDF("group", "id", "score"), Seq("group"), Seq("score", "id"),
        k = 3, rankName = "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(streaming === batch)
  }
}
