package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming corpus maintainer equals the batch maintenance gate:
  * feeding q_pipeline_incr's delta through [[StreamingPipeline]] as
  * doc_id-ordered micro-batches admits EXACTLY the rows the one-shot
  * batch form (the driver-gated q_pipeline_incr) admits — the round-15
  * continuous-maintenance pin, composing the q_dedup_incr recall
  * argument with first-seen-wins admission across batches. */
class StreamingPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("doc_id-ordered micro-batches admit exactly the batch " +
      "q_pipeline_incr increment (3 batches, sf0.001)") {
    val sp = spark
    import sp.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val bench = docs.where(col("doc_id") % 50 === 0)
    // the stored base: quality survivors of the non-delta corpus and
    // their signature table — the same staged tables the batch gate
    // reads, filtered identically
    val qdocs = graft.queries.PipelineQueries.stagedQdocs(spark, sfDir)
    val baseDocs = qdocs.where(col("doc_id") % 5 =!= 0)
    val baseSigs = graft.queries.PipelineQueries.stagedSigs(spark, sfDir)
      .where(col("doc_id") % 5 =!= 0)
    val maintainer = new StreamingPipeline(bench, baseDocs, baseSigs)

    // the RAW delta (the maintainer quality-filters it itself), in
    // ascending doc_id order, split into three contiguous micro-batches
    val delta = docs
      .where(col("doc_id") % 50 =!= 0 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(delta.length > 10, "fixture must provide a real delta")
    val chunks = delta.grouped((delta.length + 2) / 3).toSeq
    assert(chunks.size == 3)

    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Long, String, String, Long)]
    val stream = mem.toDF().toDF("doc_id", "text", "source", "n_chars")
      .writeStream
      .foreachBatch(maintainer.processBatch _)
      .start()
    try {
      // addData + drain per chunk so each chunk IS one micro-batch
      chunks.foreach { c =>
        mem.addData(c.toIndexedSeq)
        stream.processAllAvailable()
      }
    } finally stream.stop()

    val got = maintainer.admitted
      .select("doc_id", "source", "lang_pred", "n_tokens", "n_chars")
      .collect().map(_.toString).sorted.toSeq
    val expected = graft.queries.PipelineQueries.qPipelineIncr(spark, sfDir)
      .select("doc_id", "source", "lang_pred", "n_tokens", "n_chars")
      .collect().map(_.toString).sorted.toSeq
    maintainer.close()
    assert(got.nonEmpty, "the stream must admit documents at sf0.001")
    assert(got === expected)
  }
}
