package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class IncrementalSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val log = {
    val sp = spark
    import sp.implicits._
    Seq(
      ("u1", "e1", ts("2024-01-01 10:00:00"), 0L),
      ("u1", "e2", ts("2024-01-02 10:00:00"), 1L),
      ("u2", "e3", ts("2024-01-01 11:00:00"), 0L),
      ("u2", "e4", ts("2024-01-04 11:00:00"), 1L),
      ("u3", "e5", ts("2024-01-05 09:00:00"), 0L),
    ).toDF("uuids_id", "data_etag", "modified", "version")
  }

  test("incremental batch: rows after watermark folded to latest per uuid") {
    val out = Incremental.incrementalBatch(log, lit(ts("2024-01-03 00:00:00")))
      .orderBy("uuids_id").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("u2", "u3"))
    assert(out(0).getString(1) === "e4") // u2's post-watermark latest
    assert(out(1).getString(1) === "e5")
  }

  test("resume actions classify index/delete/skip by etag diff") {
    val sp = spark
    import sp.implicits._
    val store = Seq(
      ("u1", "e2", false), // indexed with e2 → skip
      ("u2", "e4", false), // indexed with e3 → index (etag changed)
      ("u3", "e5", false), // not indexed → index
      ("u4", "e9", true),  // tombstoned → delete
    ).toDF("uuids_id", "etag", "deleted")
    val indexed = Seq(("u1", "e2"), ("u2", "e3"), ("u5", "e0"))
      .toDF("uuid", "etag")
    val got = Incremental.resumeActions(store, indexed)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("u1" -> "skip", "u2" -> "index", "u3" -> "index",
      "u4" -> "delete", "u5" -> "delete"))
  }

  test("continuous: streaming log upserts latest-per-uuid via foreachBatch merge") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, String, java.sql.Timestamp, Long)]
    val stream = mem.toDF().toDF("uuids_id", "data_etag", "modified", "version")

    val state = scala.collection.concurrent.TrieMap.empty[String, (String, Long)]
    val q = Incremental.continuous(stream, "1 hour",
      java.nio.file.Files.createTempDirectory("ckpt").toString,
      Trigger.AvailableNow()) { (latest, _) =>
      latest.collect().foreach { r =>
        val (u, e, v) = (r.getString(0), r.getString(1), r.getLong(2))
        if (state.get(u).forall(_._2 <= v)) state(u) = (e, v)
      }
    }
    mem.addData(
      ("u1", "e1", ts("2024-01-01 10:00:00"), 0L),
      ("u1", "e2", ts("2024-01-02 10:00:00"), 1L),
      ("u2", "e3", ts("2024-01-01 11:00:00"), 0L))
    q.awaitTermination(60000)
    assert(state("u1") === ("e2", 1L)) // batch folded to latest before merge
    assert(state("u2") === ("e3", 0L))
  }
}
