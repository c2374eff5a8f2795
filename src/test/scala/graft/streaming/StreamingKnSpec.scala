package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Kneser-Ney maintainer's contracts: order-free exact
  * count state, score-at-admission determinism against the batch
  * operators the q_kn* gates pin to the DuckDB oracle, final-store
  * re-score equality, replay idempotence, and mid-flight failure
  * cleanliness. */
class StreamingKnSpec extends SparkSpec {

  // a corpus with real count structure: a common phrase every third
  // doc (high-count bigrams), per-doc rare tails (singletons — the
  // discount's n1), and repeated cross-doc tails (the n2 mass)
  private def rows: Seq[(Long, String)] = (1L to 30L).map { i =>
    val mid = if (i % 3 == 0) "the quick brown fox" else s"rare$i tail$i"
    (i, s"start${i % 4} $mid end${i % 5}")
  }

  private def docsDf(rs: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rs.toDF("doc_id", "text")
  }

  private def toks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), split(col("text"), " ").as("_w"))

  private def countMap(df: DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  private def scoreMap(df: DataFrame): Map[Long, (Long, Double, Double)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  private def runStream(m: StreamingKn,
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

  test("count store is exact in any arrival order; per-batch scores are " +
      "score-at-admission against the prefix; re-scoring the corpus " +
      "against the FINAL store equals the batch gate; replay is a no-op") {
    val all = rows
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    assert(chunks.size == 3)
    val allDf = docsDf(all)
    val batchCounts = Corpus.knCounts(toks(allDf), "doc_id", "_w")

    val m = new StreamingKn(spark, "doc_id", "text")
    runStream(m, chunks)

    // 1. store == one-shot knCounts of the union (exact mergeable
    //    sufficient statistics, so the derived model matches too)
    assert(countMap(m.countsTable) === countMap(batchCounts))

    // 2. score-at-admission: batch 1's logged scores equal the batch
    //    operator run against the batch-0+1 prefix counts
    val prefixCounts = Corpus.knMergeCounts(
      Corpus.knCounts(toks(docsDf(chunks.head)), "doc_id", "_w"),
      Corpus.knCounts(toks(docsDf(chunks(1))), "doc_id", "_w"))
    val expect1 = scoreMap(Corpus.knScoreFromCounts(
      toks(docsDf(chunks(1))), "doc_id", "_w", prefixCounts))
    val logged1 = scoreMap(m.scored.where(col("batch_id") === 1)
      .select("doc_id", "n_bigrams", "avg_logprob", "ppl"))
    assert(logged1 === expect1)

    // 3. re-scoring the FULL corpus against the final store reproduces
    //    the batch gate (the q_kn_incr equality, streaming edition)
    assert(scoreMap(Corpus.knScoreFromCounts(
        toks(allDf), "doc_id", "_w", m.countsTable)) ===
      scoreMap(Corpus.knScoreFromCounts(
        toks(allDf), "doc_id", "_w", batchCounts)))

    // 4. replaying a committed batchId is a no-op — state AND log
    val before = (countMap(m.countsTable), m.scored.count())
    m.processBatch(docsDf(chunks.head), 0L)
    assert((countMap(m.countsTable), m.scored.count()) === before)

    // 5. arrival-order invariance of the STORE (admission scores
    //    legitimately differ by prefix; the state must not)
    val m2 = new StreamingKn(spark, "doc_id", "text")
    runStream(m2, chunks.reverse)
    assert(countMap(m2.countsTable) === countMap(m.countsTable))
  }

  test("a batch that fails mid-flight leaves the maintainer replayable: " +
      "counts, log, and lastBatchId untouched; the clean re-run of the " +
      "same batchId then commits; drained logs release without state") {
    val sp = spark
    import sp.implicits._
    val m = new StreamingKn(spark, "doc_id", "text")
    m.processBatch(docsDf(Seq((1L, "a b a b c"))), 0L)
    val c0 = countMap(m.countsTable)
    assert(c0(("a", "b")) === 2L)
    // the fault fires inside the batch's count cut — the FIRST
    // distributed step — so nothing downstream (merge swap, commit)
    // may run or leak
    val fault = udf { (id: Long) =>
      sys.error("injected kn fault"): java.lang.Long }
    val bad = Seq((2L, "x y z")).toDF("raw_id", "text")
      .select(fault(col("raw_id")).as("doc_id"), col("text"))
    intercept[Throwable] { m.processBatch(bad, 1L) }
    assert(countMap(m.countsTable) === c0)
    assert(m.scored.where(col("batch_id") === 1).count() === 0L)
    // the replay of the SAME batchId (now clean) commits normally
    m.processBatch(docsDf(Seq((2L, "x y x y"))), 1L)
    assert(countMap(m.countsTable)(("x", "y")) === 2L)
    assert(m.scored.where(col("batch_id") === 1).count() === 1L)
    // draining the log releases entries but never the count store
    m.releaseScored(1L)
    assert(m.scored.count() === 0L)
    assert(countMap(m.countsTable)(("x", "y")) === 2L)
  }
}
