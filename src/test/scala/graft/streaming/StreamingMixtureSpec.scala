package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming mixture maintainer's contracts: order-free exact
  * counts (so final-store weights equal the batch gate's), replicate-
  * at-admission determinism, replay idempotence, and mid-flight
  * failure replayability — all against the operators q_temperature_
  * remix pins to the DuckDB oracle. */
class StreamingMixtureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val Alpha = 0.3

  private def docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"))

  private def wtsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def runStream(m: StreamingMixture,
      chunks: Seq[Array[(Long, String)]]): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "source")
      .writeStream
      .foreachBatch(m.processBatch _)
      .start()
    try {
      chunks.foreach { c =>
        mem.addData(c.toSeq)
        stream.processAllAvailable()
      }
    } finally stream.stop()
  }

  test("counts are exact in any arrival order; final-store weights " +
      "equal the batch gate; batch 0's mixture is replicate-at-" +
      "admission; replay and release behave") {
    val rows = docs.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    assert(chunks.size == 3)

    val m = new StreamingMixture(spark, "doc_id", "source", Alpha)
    runStream(m, chunks)

    // 1. count store == one-shot per-source counts
    val batchCounts = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.countStore === batchCounts)

    // 2. weights from the final store == the batch operator
    assert(wtsMap(Corpus.temperatureWeightsFromSizes(
        m.sizesTable, "source", Alpha)) ===
      wtsMap(Corpus.temperatureWeights(docs, "source", Alpha)))

    // 3. replicate-at-admission: batch 0's emitted rows equal the
    //    batch remix of chunk 0 under its own prefix weights
    val sp = spark
    import sp.implicits._
    val b0 = chunks.head.toSeq.toDF("doc_id", "source")
    val want0 = Corpus.remixByWeights(b0,
        Corpus.temperatureWeights(b0, "source", Alpha), "source", "doc_id")
      .select(col("doc_id"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got0 = m.emitted.get.where(col("batch_id") === 0)
      .select(col("doc_id"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got0 === want0)

    // 4. replay of a committed batchId is a no-op
    val emittedCount = m.emitted.get.count()
    m.processBatch(b0, 0L)
    assert(m.emitted.get.count() === emittedCount)
    assert(m.countStore === batchCounts)

    // 5. reversed arrival converges to the same store
    val m2 = new StreamingMixture(spark, "doc_id", "source", Alpha)
    runStream(m2, chunks.reverse)
    assert(m2.countStore === batchCounts)

    // 6. draining consumers release the log; the store is untouched
    m.releaseEmitted(upToBatchId = 1L)
    assert(m.emitted.get.select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(2L))
    assert(m.countStore === batchCounts)
  }

  test("a batch that fails mid-flight leaves the maintainer " +
      "replayable: store, log, and lastBatchId untouched") {
    val sp = spark
    import sp.implicits._
    val m = new StreamingMixture(spark, "doc_id", "source", Alpha)
    m.processBatch(Seq((1L, "a"), (2L, "b")).toDF("doc_id", "source"), 0L)
    val statsAfter0 = m.countStore
    // the fault is on the ID column, which only the remix draw
    // touches — the count aggregation (keyed on source) succeeds, so
    // the failure fires at the commit point with the merged counts
    // already computed; none of it may reach the store
    val fault = org.apache.spark.sql.functions.udf { (id: Long) =>
      sys.error("injected mixture fault"): java.lang.Long }
    val bad = Seq((3L, "a")).toDF("raw_id", "source")
      .select(fault(col("raw_id")).as("doc_id"), col("source"))
    intercept[Throwable] { m.processBatch(bad, 1L) }
    assert(m.countStore === statsAfter0)
    assert(m.emitted.get.select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(0L))
    // the repaired replay of batchId 1 commits cleanly
    m.processBatch(Seq((3L, "a")).toDF("doc_id", "source"), 1L)
    assert(m.countStore === Map("a" -> 2L, "b" -> 1L))
  }
}
