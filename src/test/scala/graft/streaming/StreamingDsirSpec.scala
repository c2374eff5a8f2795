package graft.streaming

import graft.SparkSpec
import graft.operators.Corpus
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming DSIR maintainer's three contracts: order-free exact
  * stats, score-at-admission determinism, and replay idempotence —
  * all against the batch operators the q_dsir/q_dsir_incr gates pin
  * to the DuckDB oracle. */
class StreamingDsirSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val B = 256

  private def docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("lang"))

  private def batchStats = Corpus
    .dsirStats(docs, "text", col("lang") === "en", B)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def weightsMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runStream(maintainer: StreamingDsir,
      chunks: Seq[Array[(Long, String, String)]]): Unit = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF().toDF("doc_id", "text", "lang")
      .writeStream
      .foreachBatch(maintainer.processBatch _)
      .start()
    try {
      chunks.foreach { c =>
        mem.addData(c.toSeq)
        stream.processAllAvailable()
      }
    } finally stream.stop()
  }

  test("stats are exact in any batch split and arrival order; the " +
      "final-store re-score equals the batch gate; per-batch weights " +
      "are score-at-admission against the prefix") {
    val rows = docs.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length > 30)
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    assert(chunks.size == 3)

    val m = new StreamingDsir(spark, "doc_id", "text",
      col("lang") === "en", B)
    runStream(m, chunks)

    // 1. store == one-shot sufficient statistics of the union
    assert(m.statsStore === batchStats)

    // 2. re-scoring the full corpus against the FINAL store equals the
    //    gated batch operator bit-for-bit
    val rescored = weightsMap(Corpus.dsirWeightsFromStats(
      docs, "doc_id", "text", m.statsTable, B))
    val batch = weightsMap(Corpus.dsirWeights(
      docs, "doc_id", "text", col("lang") === "en", B))
    assert(rescored === batch)

    // 3. score-at-admission: batch 0's logged weights equal scoring
    //    batch 0 against its own stats alone (the stream prefix), and
    //    differ from the final-distribution weights for at least one
    //    doc (the stated streaming-vs-batch trade has real teeth here)
    val sp = spark
    import sp.implicits._
    val b0 = chunks.head.toSeq.toDF("doc_id", "text", "lang")
    val prefix0 = weightsMap(Corpus.dsirWeightsFromStats(b0, "doc_id",
      "text", Corpus.dsirStats(b0, "text", col("lang") === "en", B), B))
    val logged0 = weightsMap(
      m.scored.where(col("batch_id") === 0).select("doc_id", "weight_nano"))
    assert(logged0 === prefix0)
    assert(chunks.head.exists { case (id, _, _) => logged0(id) != batch(id) })

    // 4. the admission log covers every doc exactly once
    assert(m.scored.count() === rows.length.toLong)

    // 5. replaying an already-committed batchId is a no-op
    m.processBatch(b0, 0L)
    assert(m.statsStore === batchStats)
    assert(m.scored.count() === rows.length.toLong)

    // 6. arrival-order invariance of the STORE: the reversed chunk
    //    order converges to the same statistics
    val m2 = new StreamingDsir(spark, "doc_id", "text",
      col("lang") === "en", B)
    runStream(m2, chunks.reverse)
    assert(m2.statsStore === batchStats)
  }

  test("a batch that fails mid-flight leaves the maintainer " +
      "replayable: store, log, and lastBatchId untouched") {
    val sp = spark
    import sp.implicits._
    val m = new StreamingDsir(spark, "doc_id", "text",
      col("lang") === "en", B)
    val good = Seq((1L, "alpha beta", "en"), (2L, "gamma delta", "de"))
      .toDF("doc_id", "text", "lang")
    m.processBatch(good, 0L)
    val statsAfter0 = m.statsStore
    // the fault is on the ID column, which only the SCORING scan
    // touches — dsirStats (the text explode) succeeds, so the failure
    // fires exactly at the commit point: the batch's counts are
    // already merged into a local value when the cut throws, and the
    // contract is that NONE of that reaches the store
    val fault = org.apache.spark.sql.functions.udf { (id: Long) =>
      sys.error("injected dsir fault"): java.lang.Long }
    val bad = Seq((3L, "epsilon zeta", "en")).toDF("raw_id", "text", "lang")
      .select(fault(col("raw_id")).as("doc_id"), col("text"), col("lang"))
    intercept[Throwable] { m.processBatch(bad, 1L) }
    assert(m.statsStore === statsAfter0)
    assert(m.scored.count() === 2L)
    // the replay of batchId 1 with the repaired batch commits cleanly
    m.processBatch(Seq((3L, "epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang"), 1L)
    assert(m.scored.count() === 3L)
    assert(m.statsStore !== statsAfter0)
    // draining consumers release the log prefix; the stats store —
    // the decision state — is untouched
    val statsFinal = m.statsStore
    m.releaseScored(upToBatchId = 0L)
    assert(m.scored.collect().map(_.getLong(2)).toSet === Set(1L))
    assert(m.statsStore === statsFinal)
    m.releaseScored(upToBatchId = 1L)
    assert(m.scored.count() === 0L)
  }
}
