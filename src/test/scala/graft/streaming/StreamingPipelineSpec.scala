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

  // shared fixture for the failure/ordering cases: the stored base and
  // the raw delta rows, exactly as the batch-equivalence test builds them
  private def fixture() = {
    val docs = graft.Tables.documents(spark, sfDir)
    val bench = docs.where(col("doc_id") % 50 === 0)
    val qdocs = graft.queries.PipelineQueries.stagedQdocs(spark, sfDir)
    val baseDocs = qdocs.where(col("doc_id") % 5 =!= 0)
    val baseSigs = graft.queries.PipelineQueries.stagedSigs(spark, sfDir)
      .where(col("doc_id") % 5 =!= 0)
    val delta = docs
      .where(col("doc_id") % 50 =!= 0 && col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    (bench, baseDocs, baseSigs, delta)
  }

  test("a batch whose cut THROWS leaves the maintainer replayable and " +
      "orphans no pinned blocks: replaying the same batchId yields the " +
      "store the un-failed run would have") {
    val sp = spark
    import sp.implicits._
    val (bench, baseDocs, baseSigs, delta) = fixture()
    val chunks = delta.grouped((delta.length + 1) / 2).toSeq
    assert(chunks.size == 2)
    def df(c: Seq[(Long, String, String, Long)]) =
      c.toDF("doc_id", "text", "source", "n_chars")
    // the poisoned bench throws while the third (admitted-accumulator)
    // cut materializes — AFTER the first two store cuts have persisted,
    // the exact mid-batch failure window the commit ordering guards
    val poison = udf { (t: String) =>
      if (StreamingPipelineSpec.poisonOn) sys.error("injected bench fault")
      t
    }
    val maintainer = new StreamingPipeline(
      bench.withColumn("text", poison(col("text"))), baseDocs, baseSigs)
    maintainer.processBatch(df(chunks.head.toIndexedSeq), 1L)
    val afterB1 = maintainer.admitted.select("doc_id")
      .as[Long].collect().sorted.toSeq

    graft.Staging.releasePinned(spark)
    val persistedBefore = sc.getPersistentRDDs.keySet
    StreamingPipelineSpec.poisonOn = true
    val e = intercept[Exception] {
      maintainer.processBatch(df(chunks(1).toIndexedSeq), 2L)
    }
    assert(e.getMessage != null)
    StreamingPipelineSpec.poisonOn = false
    // no maintainer state moved, and the failed batch's transient cuts
    // (survivors, pair list, the two landed store cuts) all unpersisted
    // BY THE BATCH ITSELF — no manual releasePinned here: the pin
    // scope inside processBatch must have released the iterative
    // operators' transient pins too. Set-difference, not count
    // equality: the ContextCleaner may drop UNRELATED stale entries
    // concurrently (GC-driven), which must not flake the orphan check
    val newlyPersisted = sc.getPersistentRDDs.keySet -- persistedBefore
    val detail = newlyPersisted.toSeq.sorted.map { id =>
      val r = sc.getPersistentRDDs(id)
      s"$id:${r.getClass.getSimpleName}:${r.name}:${r.toString}"
    }
    assert(newlyPersisted.isEmpty,
      s"a failed batch must not orphan pinned blocks, left: $detail")
    assert(maintainer.admitted.select("doc_id")
      .as[Long].collect().sorted.toSeq === afterB1,
      "a failed batch must not change the admitted set")

    // REPLAY of the same batchId runs cleanly (lastBatchId unadvanced)…
    maintainer.processBatch(df(chunks(1).toIndexedSeq), 2L)
    // …and a SUCCESSFUL batch's only surviving pins are its three
    // store cuts (the superseded trio was released at the commit
    // point; the in-batch iterative pins died with the pin scope)
    val afterReplay = sc.getPersistentRDDs.keySet -- persistedBefore
    assert(afterReplay.size <= 3,
      s"a successful batch leaves only its store cuts pinned: $afterReplay")
    val replayed = maintainer.admitted.select("doc_id")
      .as[Long].collect().sorted.toSeq
    maintainer.close()
    // …and equals a maintainer that never failed
    val clean = new StreamingPipeline(bench, baseDocs, baseSigs)
    clean.processBatch(df(chunks.head.toIndexedSeq), 1L)
    clean.processBatch(df(chunks(1).toIndexedSeq), 2L)
    val expected = clean.admitted.select("doc_id")
      .as[Long].collect().sorted.toSeq
    clean.close()
    assert(replayed === expected)
  }

  test("SHUFFLED micro-batch arrival is a VALID first-seen-wins dedup " +
      "(StreamingPipeline.scala admission contract): admitted docs are " +
      "uncontaminated quality survivors, and every non-admitted, " +
      "non-contaminated survivor has an exact-Jaccard>=0.5 witness " +
      "stored at or before its own arrival") {
    val sp = spark
    import sp.implicits._
    val (bench, baseDocs, baseSigs, delta) = fixture()
    // arrival order: REVERSED chunks — later doc_ids arrive first, so
    // the canonical survivor of a cluster differs from the batch form's
    val chunks = delta.grouped((delta.length + 2) / 3).toSeq.reverse
    def df(c: Seq[(Long, String, String, Long)]) =
      c.toDF("doc_id", "text", "source", "n_chars")
    val maintainer = new StreamingPipeline(bench, baseDocs, baseSigs)
    chunks.zipWithIndex.foreach { case (c, i) =>
      maintainer.processBatch(df(c.toIndexedSeq), i.toLong)
    }
    val admitted = maintainer.admitted.select("doc_id")
      .as[Long].collect().toSet
    maintainer.close()

    val arrival: Map[Long, Int] = chunks.zipWithIndex
      .flatMap { case (c, i) => c.map(d => d._1 -> i) }.toMap
    // the delta's quality survivors and their contamination flags, via
    // the same gated operators the maintainer composes
    val deltaDf = df(delta.toIndexedSeq)
    val qd = graft.queries.LlmQueries.qualitySurvivors(deltaDf)
    val survivorRows = qd.select("doc_id", "text")
      .as[(Long, String)].collect()
    val survivors = survivorRows.map(_._1).toSet
    val contaminated = graft.operators.Corpus
      .decontaminate(qd, bench, "doc_id", "text")
      .select("doc_id").distinct().as[Long].collect().toSet

    assert(admitted.subsetOf(survivors),
      "only quality survivors can be admitted")
    assert((admitted & contaminated).isEmpty,
      "contaminated docs are never admitted")

    // witness check with DRIVER-SIDE exact shingle Jaccard (the verify
    // stage's ground truth, recomputed independently): a killed doc
    // must tie at >=0.5 to a base doc or to a delta survivor that
    // arrived in the same or an earlier batch
    def shingles(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val baseShingles = baseDocs.select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> shingles(t) }
    val deltaShingles = survivorRows
      .map { case (id, t) => id -> shingles(t) }.toMap
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty || b.isEmpty) 0.0
      else (a & b).size.toDouble / (a | b).size.toDouble
    val killed = (survivors -- admitted -- contaminated).toSeq.sorted
    assert(killed.nonEmpty,
      "the fixture must exercise at least one dedup kill")
    killed.foreach { k =>
      val ks = deltaShingles(k)
      val witnessed =
        baseShingles.exists { case (_, ws) => jac(ks, ws) >= 0.5 } ||
          deltaShingles.exists { case (w, ws) =>
            w != k && arrival(w) <= arrival(k) && jac(ks, ws) >= 0.5 }
      assert(witnessed,
        s"killed doc $k has no earlier-arrival near-dup witness")
    }
  }
}

object StreamingPipelineSpec {
  @volatile var poisonOn = false
}
