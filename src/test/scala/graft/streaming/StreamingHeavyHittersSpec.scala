package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingHeavyHittersSpec extends SparkSpec {

  test("running heavy hitters: majority key survives decrements across " +
      "micro-batches; state stays bounded at capacity") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = StreamingHeavyHitters.runningHeavyHitters(
      mem.toDF.toDF("group", "key"), capacity = 2)
    val q = out.writeStream.format("memory").queryName("shh")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: heavy ×6 + 3 singletons into capacity 2
      mem.addData((1 to 6).map(_ => ("g", "heavy")) ++
        Seq(("g", "s1"), ("g", "s2"), ("g", "s3")): _*)
      q.processAllAvailable()
      // batch 2: more singletons keep pressuring the map; heavy persists
      mem.addData(("g", "s4"), ("g", "s5"), ("g", "heavy"))
      q.processAllAvailable()
      val last = sp.sql("SELECT key, cnt FROM shh").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // every snapshot ≤ capacity entries; final snapshot retains heavy
      // (true count 7 > n/(cap+1) = 12/3)
      val lastSnapshotKeys = last.takeRight(2).map(_._1)
      assert(lastSnapshotKeys.contains("heavy"),
        s"heavy key lost: ${last.mkString(",")}")
    } finally q.stop()
  }

  test("batch mode equals the TypedImperativeAggregate on one partition") {
    val sp = spark
    import sp.implicits._
    // single partition: both sides fold the identical sequence, so the
    // summaries must agree exactly (across partitions each side merges
    // in its own order — only the retention GUARANTEE is shared)
    val rows = ((1 to 9).map(_ => "a") ++ (1 to 5).map(_ => "b") ++
      (1 to 40).map(i => s"t$i")).map(("g", _))
    val df = rows.toDF("group", "key").coalesce(1)
    val stream = StreamingHeavyHitters.runningHeavyHitters(df, 8)
      .collect().map(s => (s.key, s.cnt)).toMap
    val agg = df.agg(graft.functions.MisraGries.misraGries(col("key"), 8).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(stream === agg)
  }
}
