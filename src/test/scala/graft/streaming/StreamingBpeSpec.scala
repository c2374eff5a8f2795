package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming BPE maintainer's contracts: order-free exact vocab
  * state, retrain-equals-batch-training (the merge-exactness proof,
  * tokenizer edition), replay idempotence, and mid-flight failure
  * cleanliness. */
class StreamingBpeSpec extends SparkSpec {

  // a corpus with real merge structure: frequent stems, shared
  // suffixes, and per-doc rare tails so merge ranks are contested
  private def rows: Seq[(Long, String)] = (1L to 30L).map { i =>
    val mid = if (i % 3 == 0) "looking booking cooking" else s"rare$i"
    (i, s"start${i % 4} $mid ending${i % 5}")
  }

  private def docsDf(rs: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rs.toDF("doc_id", "text")
  }

  private def vocabMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  private def mergeSeq(df: DataFrame): Seq[(Int, String, String, String, Long)] =
    df.orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1),
      r.getString(2), r.getString(3), r.getLong(4))).toSeq

  private def runStream(m: StreamingBpe,
      chunks: Seq[Seq[(Long, String)]]): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(m.processBatch _).start()
    try {
      chunks.foreach { c => mem.addData(c); stream.processAllAvailable() }
    } finally stream.stop()
  }

  test("vocab store is exact in any arrival order; retraining from the " +
      "store equals batch-training on the union; contributions log the " +
      "per-batch word counts; replay is a no-op") {
    val all = rows
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    assert(chunks.size == 3)
    val allDf = docsDf(all)

    val m = new StreamingBpe(spark, "text")
    runStream(m, chunks)

    // 1. store == one-shot word counts of the union
    assert(vocabMap(m.vocabTable) ===
      vocabMap(Corpus.bpeWordCounts(allDf, "text")))

    // 2. retrain ≡ batch training, rank for rank (merge table, counts
    //    included — the shipped tokenizer artifact is identical)
    assert(mergeSeq(m.trainedMerges(6)) ===
      mergeSeq(Corpus.bpeTrain(allDf, "text", 6)))

    // 3. batch 1's contribution equals its own word counts
    assert(vocabMap(m.contributions.where(col("batch_id") === 1)
        .select("w", "wc")) ===
      vocabMap(Corpus.bpeWordCounts(docsDf(chunks(1)), "text")))

    // 4. replaying a committed batchId is a no-op — state AND log
    val before = (vocabMap(m.vocabTable), m.contributions.count())
    m.processBatch(docsDf(chunks.head), 0L)
    assert((vocabMap(m.vocabTable), m.contributions.count()) === before)

    // 5. arrival-order invariance of the store
    val m2 = new StreamingBpe(spark, "text")
    runStream(m2, chunks.reverse)
    assert(vocabMap(m2.vocabTable) === vocabMap(m.vocabTable))
  }

  test("a batch that fails mid-flight leaves the maintainer replayable; " +
      "the clean re-run commits; drained logs release without state") {
    val sp = spark
    import sp.implicits._
    val m = new StreamingBpe(spark, "text")
    m.processBatch(docsDf(Seq((1L, "ab ab cd"))), 0L)
    val v0 = vocabMap(m.vocabTable)
    assert(v0("ab") === 2L)
    // the fault fires inside the batch's word-count cut — nothing
    // downstream (merge swap, commit) may run or leak
    val fault = udf { (t: String) =>
      sys.error("injected bpe fault"): String }
    val bad = Seq((2L, "xy")).toDF("doc_id", "raw")
      .select(col("doc_id"), fault(col("raw")).as("text"))
    intercept[Throwable] { m.processBatch(bad, 1L) }
    assert(vocabMap(m.vocabTable) === v0)
    assert(m.contributions.where(col("batch_id") === 1).count() === 0L)
    // the replay of the SAME batchId (now clean) commits normally
    m.processBatch(docsDf(Seq((2L, "xy xy xy"))), 1L)
    assert(vocabMap(m.vocabTable)("xy") === 3L)
    // draining the log releases entries but never the vocab store
    m.releaseContributions(1L)
    assert(m.contributions.count() === 0L)
    assert(vocabMap(m.vocabTable)("xy") === 3L)
  }
}
