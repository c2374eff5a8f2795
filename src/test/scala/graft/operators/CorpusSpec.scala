package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  test("packChunks: spans are contiguous, offsets bounded, totals consistent") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, 700L), (2L, 700L), (3L, 100L), (4L, 2200L), (5L, 48L))
      .toDF("id", "n")
    val r = Corpus.packChunks(docs, "id", "n", chunkTokens = 1024)
      .orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getLong(2), x.getLong(3), x.getLong(4)))
    // cum: 700, 1400, 1500, 3700, 3748
    assert(r(0) === ((1L, 700L, 0L, 0L, 0L)))     // [0,700) in chunk 0
    assert(r(1) === ((2L, 700L, 0L, 1L, 700L)))   // [700,1400) spans 0→1
    assert(r(2) === ((3L, 100L, 1L, 1L, 376L)))   // [1400,1500)
    assert(r(3) === ((4L, 2200L, 1L, 3L, 476L)))  // [1500,3700) spans 1→3
    assert(r(4) === ((5L, 48L, 3L, 3L, 628L)))    // [3700,3748)
  }

  test("packChunksSharded: row-equal to the global spec under (shard, order)") {
    val s = spark
    import s.implicits._
    // sizes straddle the chunk boundary: some docs span chunks, some
    // chunks span shards — the base-offset arithmetic must carry a
    // partially-filled chunk across a shard boundary
    val docs = (1L to 97L).map(i => (s"shard${i % 5}", i, (i * 37) % 900 + 1))
      .toDF("shard", "id", "n")
    val global = Corpus.packChunks(
        docs.withColumn("_ord", struct(col("shard"), col("id"))),
        "_ord", "n", chunkTokens = 256)
      .drop("_ord")
    val sharded = Corpus.packChunksSharded(docs, "shard", "id", "n", 256)
    assert(sharded.collect().map(_.toSeq).toSet ===
      global.collect().map(_.toSeq).toSet)
  }

  test("packChunksSharded: degenerates to the global form on one shard") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, 700L), (2L, 700L), (3L, 100L), (4L, 2200L), (5L, 48L))
      .toDF("id", "n").withColumn("shard", lit("only"))
    val cols = Seq("shard", "id", "n", "first_chunk", "last_chunk",
      "chunk_offset").map(col)
    val g = Corpus.packChunks(one, "id", "n", chunkTokens = 1024).select(cols: _*)
    val sh = Corpus.packChunksSharded(one, "shard", "id", "n", chunkTokens = 1024)
      .select(cols: _*)
    assert(sh.collect().map(_.toSeq).toSet === g.collect().map(_.toSeq).toSet)
  }

  test("packChunksSharded: no unpartitioned window over the corpus") {
    val s = spark
    import s.implicits._
    val docs = (1L to 50L).map(i => (s"s${i % 3}", i, i)).toDF("shard", "id", "n")
    val lp = Corpus.packChunksSharded(docs, "shard", "id", "n", 256)
      .queryExecution.optimizedPlan
    val wins = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // any window that still sees per-document rows (the `id` column)
    // must be shard-partitioned; the only unpartitioned window is over
    // the per-shard totals table — one row per shard, id long gone
    val corpusWins = wins.filter(_.child.output.exists(_.name == "id"))
    assert(corpusWins.nonEmpty, lp.toString)
    corpusWins.foreach(w => assert(w.partitionSpec.nonEmpty, w.toString))
    val totalsWins = wins.filterNot(_.child.output.exists(_.name == "id"))
    assert(totalsWins.forall(_.partitionSpec.isEmpty))
  }

  test("decontaminate flags only docs sharing enough shingles with the benchmark") {
    val s = spark
    import s.implicits._
    val benchText = "the quick brown fox jumps over the lazy sleeping dog today"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val corpus = Seq(
      // contains a long verbatim run of the benchmark → many shared 5-grams
      (1L, "intro words then " + benchText + " and a conclusion"),
      // shares a single 5-gram only → below the threshold
      (2L, "quick brown fox jumps over something else entirely different here now"),
      // disjoint
      (3L, "completely unrelated text about databases and query planning engines"),
    ).toDF("doc_id", "text")
    val flagged = Corpus.decontaminate(corpus, bench, "doc_id", "text",
        n = 5, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.map(_._1).toSet === Set(1L))
    assert(flagged.head._2 === 100L)
    assert(flagged.head._3 >= 6) // the verbatim run shares its whole 5-gram chain
  }

  test("hashSplit: deterministic, total partition, roughly proportional") {
    val s = spark
    import s.implicits._
    val ids = (1L to 1000L).toDF("id")
    val splits = ids.select(col("id"),
        Corpus.hashSplit(col("id"), 90, 5).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum === 1000L)
    assert(splits("train") > 850 && splits("train") < 950)
    assert(splits.keySet === Set("train", "val", "test"))
    // determinism: same id → same split on re-evaluation
    val again = ids.select(Corpus.hashSplit(col("id"), 90, 5)).collect()
    val first = ids.select(Corpus.hashSplit(col("id"), 90, 5)).collect()
    assert(again.map(_.getString(0)).toSeq === first.map(_.getString(0)).toSeq)
  }

  test("quotaSample: heap operator equals the window formulation row-for-row") {
    val s = spark
    import s.implicits._
    val docs = (1L to 300L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")
    val heap = Corpus.quotaSample(docs, "source", "doc_id", k = 9)
      .collect().map(_.toSeq).toSet
    val window = Corpus.quotaSampleWindow(docs, "source", "doc_id", k = 9)
      .collect().map(_.toSeq).toSet
    assert(heap === window)
  }

  test("quotaSample: caps every group at k, deterministically") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i => (i, if (i <= 30) "big" else "small"))
      .toDF("doc_id", "source")
    val out = Corpus.quotaSample(docs, "source", "doc_id", k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup("big").length === 5, "hot group capped at k")
    assert(byGroup("small").length === 5, "10-doc group also capped at k")
    assert(out.forall(_._3 <= 5))
    // selection is content-hash determined: independent of partitioning
    val again = Corpus.quotaSample(docs.repartition(7), "source", "doc_id", k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    assert(again === out.toSet)
  }

  test("piiScrub redacts emails, phones, and IPs with per-class counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "write to jane.doe+spam@lists.example.org or bob@example.com today"),
      (2L, "server 192.168.1.17 called +1-415-555-0199 twice"),
      (3L, "no pii here at all"),
      (4L, "version 1.2 and section 3.4.5 are not addresses"),
    ).toDF("doc_id", "text")
    val out = Corpus.piiScrub(docs, "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out(0) === ((1L, "write to <EMAIL> or <EMAIL> today", 2, 0, 0)))
    assert(out(1) === ((2L, "server <IP> called <PHONE> twice", 0, 1, 1)))
    assert(out(2) === ((3L, "no pii here at all", 0, 0, 0)))
    // short dotted numerics must not false-positive as IPv4
    assert(out(3) === ((4L, "version 1.2 and section 3.4.5 are not addresses", 0, 0, 0)))
  }

  test("piiScrub stays UDF-free and shuffle-free (scan-speed at scale)") {
    val s = spark
    import s.implicits._
    val plan = Corpus.piiScrub(Seq((1L, "x")).toDF("doc_id", "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
