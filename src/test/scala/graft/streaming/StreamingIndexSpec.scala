package graft.streaming

import graft.SparkSpec
import graft.operators.Search
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Continuous index maintenance: each micro-batch of harvested
  * documents builds only ITS OWN segments and merges them into the
  * running index via [[Search.mergeSegments]] — the streaming form of
  * the reference's per-harvest ES bulk indexing, and the consumer of
  * the merge algebra SearchSpec pins (merge order can't change the
  * index). The end state must equal the one-shot batch build of the
  * full corpus. */
class StreamingIndexSpec extends SparkSpec {

  test("foreachBatch delta-merge converges to the batch-built index") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String)]
    var index: Option[DataFrame] = None
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = Search.invertedSegments(
          Search.invertedPostings(batch, "doc_id", "text"), nShards = 4)
        // a real deployment persists the merge result per batch; the
        // in-memory fold exercises the identical dataflow
        index = Some(index.fold(delta)(Search.mergeSegments(_, delta))
          .localCheckpoint())
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      mem.addData((1L, "the quick fox"), (2L, "the slow fox"))
      q.processAllAvailable()
      mem.addData((3L, "quick quick brown fox"))
      q.processAllAvailable()
      mem.addData((4L, "lazy dog"))
      q.processAllAvailable()
    } finally q.stop()

    val whole = Seq((1L, "the quick fox"), (2L, "the slow fox"),
      (3L, "quick quick brown fox"), (4L, "lazy dog"))
      .toDF("doc_id", "text")
    def key(df: DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getInt(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(_.toSeq))
    }.toSet
    val batchBuilt = key(Search.invertedSegments(
      Search.invertedPostings(whole, "doc_id", "text"), nShards = 4))
    assert(key(index.get) === batchBuilt)
  }
}
