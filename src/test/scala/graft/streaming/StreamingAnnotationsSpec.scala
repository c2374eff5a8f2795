package graft.streaming

import graft.SparkSpec
import graft.store.RecordStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming annotations maintainer's contracts: order-free exact
  * upsert state (merge ≡ one-shot aggregate of the union log — the
  * ON CONFLICT semantics the q_annotations gate pins), per-batch
  * admission aggregates, replay idempotence, and mid-flight failure
  * cleanliness. */
class StreamingAnnotationsSpec extends SparkSpec {

  // a submission log with real conflict traffic: 8 source_ids fed by
  // 40 submissions, identity columns varying ACROSS submissions of
  // the same source_id so first-insert-wins is load-bearing
  private def rows: Seq[(String, String, String, String, Boolean, String, Long)] =
    (1L to 40L).map { arr =>
      (s"ann${arr % 8}", s"u${arr % 5}", s"body$arr", s"src${arr % 3}",
        arr % 2 == 0, s"t$arr", arr)
    }

  private val cols =
    Seq("source_id", "uuids_id", "v", "source", "approved", "updated_at", "arr")

  private def subsDf(
      rs: Seq[(String, String, String, String, Boolean, String, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rs.toDF(cols: _*)
  }

  private def storeMap(df: DataFrame)
      : Map[String, (String, String, String, Boolean, String, Long)] =
    df.collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4),
        r.getString(5), r.getLong(6)))).toMap

  private def runStream(m: StreamingAnnotations,
      chunks: Seq[Seq[(String, String, String, String, Boolean, String, Long)]])
      : Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(String, String, String, String, Boolean, String, Long)]
    val stream = mem.toDF().toDF(cols: _*)
      .writeStream.foreachBatch(m.processBatch _).start()
    try {
      chunks.foreach { c => mem.addData(c); stream.processAllAvailable() }
    } finally stream.stop()
  }

  test("store equals the one-shot upsert aggregate of the union log in " +
      "any arrival order; batch admissions are the batch's own upsert; " +
      "replay is a no-op") {
    val all = rows
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    assert(chunks.size == 3)
    val batchView = RecordStore.annotationsUpsert(subsDf(all))

    val m = new StreamingAnnotations(spark)
    runStream(m, chunks)

    // 1. store == one-shot ON CONFLICT replay over the union log
    assert(storeMap(m.storeTable) === storeMap(batchView))

    // 2. batch 1's admission equals its own upsert aggregate
    assert(storeMap(m.admitted.where(col("batch_id") === 1)
        .drop("batch_id")) ===
      storeMap(RecordStore.annotationsUpsert(subsDf(chunks(1)))))

    // 3. replaying a committed batchId is a no-op — state AND log
    val before = (storeMap(m.storeTable), m.admitted.count())
    m.processBatch(subsDf(chunks.head), 0L)
    assert((storeMap(m.storeTable), m.admitted.count()) === before)

    // 4. arrival-order invariance of the store (merge algebra is
    //    order-free over the carried arrival keys)
    val m2 = new StreamingAnnotations(spark)
    runStream(m2, chunks.reverse)
    assert(storeMap(m2.storeTable) === storeMap(m.storeTable))

    // 5. first-insert / last-write actually differ in the data (the
    //    contract is load-bearing, not vacuous): some source_id's
    //    stored uuids_id comes from an EARLIER arrival than its body
    val st = m.storeTable.collect().map(r =>
      (r.getString(0), r.getLong(7), r.getLong(8))).toSeq
    assert(st.forall { case (_, fa, la) => fa < la })
  }

  test("a batch that fails mid-flight leaves the maintainer replayable; " +
      "the clean re-run commits; drained logs release without state") {
    val sp = spark
    import sp.implicits._
    val m = new StreamingAnnotations(spark)
    m.processBatch(subsDf(Seq(
      ("a1", "u1", "b1", "s1", true, "t1", 1L),
      ("a1", "u2", "b2", "s2", false, "t2", 2L))), 0L)
    val v0 = storeMap(m.storeTable)
    assert(v0("a1") === (("u1", "b2", "s1", true, "t2", 2L)),
      "first-insert identity, last-write body")
    // the fault fires inside the batch's upsert cut — nothing
    // downstream (merge swap, commit) may run or leak
    val fault = udf { (x: String) =>
      sys.error("injected annotations fault"): String }
    val bad = subsDf(Seq(("a2", "u3", "b3", "s3", true, "t3", 3L)))
      .withColumn("v", fault(col("v")))
    intercept[Throwable] { m.processBatch(bad, 1L) }
    assert(storeMap(m.storeTable) === v0)
    assert(m.admitted.where(col("batch_id") === 1).count() === 0L)
    // the replay of the SAME batchId (now clean) commits normally
    m.processBatch(subsDf(Seq(("a2", "u3", "b3", "s3", true, "t3", 3L))), 1L)
    assert(storeMap(m.storeTable)("a2")._1 === "u3")
    // draining the log releases entries but never the store
    m.releaseAdmitted(1L)
    assert(m.admitted.count() === 0L)
    assert(storeMap(m.storeTable).contains("a2"))
  }
}
