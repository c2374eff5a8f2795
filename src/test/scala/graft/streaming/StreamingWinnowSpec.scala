package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming winnowing-index maintainer's contracts: order-free
  * exact state (index + df stats), match-at-admission determinism
  * against the batch operators the q_winnow* gates pin to the DuckDB
  * oracle, replay idempotence, and mid-flight failure cleanliness. */
class StreamingWinnowSpec extends SparkSpec {

  // the CorpusSpec winnow fixture: grpX shares a rare 20-word block
  // (real pairs), boiler rides in every doc (the df-prune case)
  private val sharedX = (1 to 20).map(j => s"blockx$j").mkString(" ")
  private val boiler = (1 to 20).map(j => s"boiler$j").mkString(" ")
  private val grpX = Set(5L, 10L, 13L, 27L)
  private def rows: Seq[(Long, String)] = (1L to 40L).map { i =>
    val mid = if (grpX(i)) sharedX
      else s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h"
    (i, s"one$i two$i three$i $mid $boiler")
  }

  private def docsDf(rs: Seq[(Long, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rs.toDF("doc_id", "text")
  }

  private def fpSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private def statsMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def runStream(m: StreamingWinnow,
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

  test("state is exact in any arrival order; per-batch matches are " +
      "match-at-admission against the prefix; the ordered union equals " +
      "the batch matcher; replay is a no-op") {
    val all = rows
    val chunks = all.grouped((all.size + 2) / 3).toSeq
    assert(chunks.size == 3)
    val allDf = docsDf(all)
    val batchFps = Corpus.winnowFingerprints(allDf, "doc_id", "text", 3, 5)

    val m = new StreamingWinnow(spark, "doc_id", "text",
      shingleSize = 3, window = 5, minShared = 2, maxDocFreq = 100)
    runStream(m, chunks)

    // 1. index == one-shot winnowFingerprints of the union; stats ==
    //    one-shot winnowDfStats of it (exact mergeable statistics)
    assert(fpSet(m.indexTable) === fpSet(batchFps))
    assert(statsMap(m.statsTable) === statsMap(Corpus.winnowDfStats(batchFps)))

    // 2. match-at-admission: batch 1's logged pairs equal the batch
    //    incremental operator run against the batch-0 prefix store
    val prefixFps = Corpus.winnowFingerprints(
      docsDf(chunks.head), "doc_id", "text", 3, 5)
    val expect1 = pairSet(Corpus.incrementalWinnowMatches(
      prefixFps, Corpus.winnowDfStats(prefixFps), docsDf(chunks(1)),
      "doc_id", "text", 3, 5, 2L, 100L))
    val logged1 = pairSet(m.matches.where(col("batch_id") === 1)
      .select("d1", "d2", "n_shared"))
    assert(logged1 === expect1)

    // 3. every pair lands exactly once, at the batch where its LATER
    //    doc arrives: the ordered union equals the batch matcher over
    //    the full corpus (no fp crosses maxDocFreq=100 here)
    val union = pairSet(m.matches.select("d1", "d2", "n_shared"))
    val batch = pairSet(Corpus.winnowMatches(batchFps, "doc_id", 2L, 100L))
    assert(union === batch)
    assert(union.nonEmpty, "fixture must exercise real pairs")

    // 4. replaying a committed batchId is a no-op — state AND log
    val before = (fpSet(m.indexTable), m.matches.count())
    m.processBatch(docsDf(chunks.head), 0L)
    assert((fpSet(m.indexTable), m.matches.count()) === before)

    // 5. arrival-order invariance of the STORE (the admitted pair set
    //    legitimately differs by prefix; the state must not)
    val m2 = new StreamingWinnow(spark, "doc_id", "text",
      shingleSize = 3, window = 5, minShared = 2, maxDocFreq = 100)
    runStream(m2, chunks.reverse)
    assert(fpSet(m2.indexTable) === fpSet(batchFps))
    assert(statsMap(m2.statsTable) === statsMap(m.statsTable))
  }

  test("the df prune judges at admission: a fingerprint crossing " +
      "maxDocFreq only later keeps its early pairs — and re-matching " +
      "a delta against the FINAL store reproduces the batch operator") {
    // chunk 0: the two grpX base docs (their shared fps have df=2);
    // chunk 1: one more grpX doc (pairs form at df=3 <= 3);
    // chunk 2: five more copies push the fp past maxDocFreq=3 — NEW
    // pairs stop, the early ones stay in the log
    val mk = (i: Long) => (i, s"pre$i a$i b$i $sharedX post$i")
    val chunks = Seq(Seq(mk(1), mk(2)), Seq(mk(3)),
      (4L to 8L).map(mk))
    val m = new StreamingWinnow(spark, "doc_id", "text",
      shingleSize = 3, window = 5, minShared = 2, maxDocFreq = 3)
    runStream(m, chunks)
    val byBatch = m.matches.groupBy("batch_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch 1 admitted its pairs (population df=3), batch 2 admitted
    // none (df=8 by then); batch 0's internal pair also admitted
    assert(byBatch.getOrElse(0L, 0L) === 1L)
    assert(byBatch(1L) === 2L)
    assert(!byBatch.contains(2L))
    // the batch operator over the FINAL population drops them all —
    // the stated streaming-vs-batch trade, with teeth
    assert(Corpus.winnowMatches(m.indexTable, "doc_id", 2L, 3L).count() === 0L)
    // re-matching chunk 1's delta against the FINAL store reproduces
    // the batch incremental operator bit-for-bit
    val refps = Corpus.winnowFingerprints(
      docsDf(chunks(1)), "doc_id", "text", 3, 5)
    val viaStore = pairSet(Corpus.incrementalWinnowMatchesFromFps(
      m.indexTable, m.statsTable, refps, "doc_id", 2L, 100L))
    val viaBatch = pairSet(Corpus.incrementalWinnowMatches(
      m.indexTable, docsDf(chunks(1)), "doc_id", "text", 3, 5, 2L, 100L))
    // note: the store already CONTAINS chunk 1's docs, so both forms
    // see the same (double-counted) population — the equality pins
    // maintained-stats == inline-stats on a live store
    assert(viaStore === viaBatch)
  }

  test("a batch that fails mid-flight leaves the maintainer replayable: " +
      "index, stats, log, and lastBatchId untouched; drained logs " +
      "release without touching state") {
    val sp = spark
    import sp.implicits._
    val m = new StreamingWinnow(spark, "doc_id", "text",
      shingleSize = 3, window = 5, minShared = 2, maxDocFreq = 100)
    m.processBatch(docsDf(Seq((1L, s"a b c $sharedX"))), 0L)
    val idx0 = fpSet(m.indexTable)
    val st0 = statsMap(m.statsTable)
    assert(idx0.nonEmpty)
    // the fault fires inside the batch's fingerprint cut — the FIRST
    // distributed step — so nothing downstream (state cuts, commit)
    // may run or leak
    val fault = udf { (id: Long) =>
      sys.error("injected winnow fault"): java.lang.Long }
    val bad = Seq((2L, s"x y z $sharedX")).toDF("raw_id", "text")
      .select(fault(col("raw_id")).as("doc_id"), col("text"))
    intercept[Throwable] { m.processBatch(bad, 1L) }
    assert(fpSet(m.indexTable) === idx0)
    assert(statsMap(m.statsTable) === st0)
    assert(m.matches.where(col("batch_id") === 1).count() === 0L)
    // the repaired replay of batchId 1 commits cleanly and pairs with
    // batch 0's doc
    m.processBatch(docsDf(Seq((2L, s"x y z $sharedX"))), 1L)
    assert(pairSet(m.matches.select("d1", "d2", "n_shared"))
      .exists(p => p._1 == 1L && p._2 == 2L))
    // drain-then-release: state untouched, released batches gone
    val idxF = fpSet(m.indexTable)
    m.releaseMatches(upToBatchId = 0L)
    assert(m.matches.collect().map(_.getLong(3)).toSet === Set(1L))
    m.releaseMatches(upToBatchId = 1L)
    assert(m.matches.count() === 0L)
    assert(fpSet(m.indexTable) === idxF)
  }
}
