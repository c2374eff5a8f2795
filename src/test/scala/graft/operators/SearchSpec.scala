package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // doc 1: "hash" twice in a short doc — highest tf density
    (1L, "hash join hash probe build side"),
    // doc 2: one "hash" in a longer doc
    (2L, "a hash table lookup inside a very long scan pipeline over rows"),
    // doc 3: no query terms at all
    (3L, "window frame sort spill buffer"),
    // doc 4: both "merge" and "scan" — two matching terms
    (4L, "merge sort scan output"),
    // doc 5: rare term "scan" only
    (5L, "scan scan scan scan"),
  ).toDF("doc_id", "text")

  test("bm25: multi-term and high-tf docs outrank, non-matching drop out") {
    val out = Search.bm25TopK(corpus, "doc_id", "text",
      terms = Seq("hash", "merge", "scan"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ranked = out.map(_._1)
    assert(!ranked.contains(3L), "doc with no query terms must not appear")
    assert(ranked.toSet === Set(1L, 2L, 4L, 5L))
    val scores = out.toMap
    // doc 1 (tf=2, dl=6) beats doc 2 (tf=1, dl=12) on the same term
    assert(scores(1L) > scores(2L))
    // scores are strictly positive and descending in rank order
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
  }

  test("bm25: saturating tf — repeating a term cannot blow up the score") {
    val out = Search.bm25TopK(corpus, "doc_id", "text",
      terms = Seq("scan"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k1=1.2 caps the tf factor at k1+1: doc 5 (tf=4) scores less than
    // (k1+1)/1 times doc 4 (tf=1, same-ish dl after normalization)
    assert(out(5L) < out(4L) * (Search.K1 + 1.0) + 1e-9)
    assert(out(5L) > out(4L), "more occurrences still rank higher")
  }

  test("bm25: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = Search.bm25TopK(corpus, "doc_id", "text",
      Seq("hash"), k = 2).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bm25: scores equal an independent local implementation exactly") {
    val terms = Seq("hash", "merge", "scan")
    val docs = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = docs.view.mapValues(_.toLowerCase.split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = words.values.map(_.size).sum.toDouble / n
    def tf(id: Long, t: String) = words(id).count(_ == t).toDouble
    def df(t: String) = words.values.count(_.contains(t)).toDouble
    def score(id: Long) = terms.map { t =>
      val f = tf(id, t)
      if (f == 0) 0.0
      else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
        (f * (Search.K1 + 1.0)) /
        (f + Search.K1 * (1.0 - Search.B + Search.B * words(id).size / avgdl))
    }.sum
    val expected = docs.keys.map(id => id -> score(id)).filter(_._2 > 0)
      .map { case (id, sc) =>
        id -> BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .toMap
    val got = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("bm25: deterministic under repartitioning") {
    val a = Search.bm25TopK(corpus, "doc_id", "text", Seq("hash", "scan"), k = 10)
      .collect().toSeq
    val b = Search.bm25TopK(corpus.repartition(7), "doc_id", "text",
      Seq("hash", "scan"), k = 10).collect().toSeq
    assert(a === b)
  }

  test("inverted index: postings carry tf + denormalized dl, one row per (term, doc)") {
    val p = Search.invertedPostings(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(r.fieldIndex("term")),
        r.getLong(r.fieldIndex("doc_id"))) ->
        (r.getLong(r.fieldIndex("tf")), r.getLong(r.fieldIndex("dl")))).toMap
    assert(p(("hash", 1L)) === (2L, 6L))   // "hash" twice in the 6-token doc
    assert(p(("scan", 5L)) === (4L, 4L))
    assert(!p.contains(("hash", 3L)))
    // no duplicate (term, doc) rows
    assert(p.size === Search.invertedPostings(corpus, "doc_id", "text").count())
  }

  test("index search equals the scan-path bm25 exactly (build once, query many)") {
    val terms = Seq("hash", "merge", "scan")
    val scan = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val viaIndex = Search.indexSearch(
        Search.invertedPostings(corpus, "doc_id", "text"),
        Search.indexStats(corpus, "doc_id", "text"), terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(viaIndex === scan)
  }

  test("index search with a term absent from the corpus still matches the scan path") {
    val terms = Seq("hash", "nosuchterm")
    val scan = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val viaIndex = Search.indexSearch(
        Search.invertedPostings(corpus, "doc_id", "text"),
        Search.indexStats(corpus, "doc_id", "text"), terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(viaIndex === scan)
  }

  test("segment merge: mergeSegments(segments(A), segments(B)) == segments(A ∪ B)") {
    val s = spark
    import s.implicits._
    val a = (1L to 60L).map(i => (i, s"the t$i common")).toDF("doc_id", "text")
    val b = (61L to 100L).map(i => (i, s"the t$i common extra")).toDF("doc_id", "text")
    def segs(d: org.apache.spark.sql.DataFrame) =
      Search.invertedSegments(Search.invertedPostings(d, "doc_id", "text"), 4)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getInt(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(_.toSeq))
    }.toSet
    val merged = key(Search.mergeSegments(segs(a), segs(b)))
    val whole = key(segs(a.unionAll(b)))
    assert(merged === whole)
  }

  test("segment-sharded layout bounds every posting-list array by the shard count") {
    val s = spark
    import s.implicits._
    // a pathological stopword: present in every one of 200 docs
    val hot = (1L to 200L).map(i => (i, s"the filler$i words"))
      .toDF("doc_id", "text")
    val segs = Search.invertedSegments(
      Search.invertedPostings(hot, "doc_id", "text"), nShards = 8)
    val theSizes = segs.filter(col("term") === "the")
      .select(size(col("postings"))).collect().map(_.getInt(0))
    assert(theSizes.length === 8, "hot term must split across all shards")
    assert(theSizes.forall(_ <= 25), s"no shard may hold the whole list: ${theSizes.toSeq}")
    assert(theSizes.sum === 200)
    // postings inside a segment are sorted by doc_id for merge-scans
    val firstSeg = segs.filter(col("term") === "the" && col("shard") === 0)
      .select(col("postings.doc_id")).collect()(0).getSeq[Long](0)
    assert(firstSeg === firstSeg.sorted)
  }

  test("tfidfTopTerms: hand-checked scores, rank order, tie-break by term") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared shared"),
      (3L, "cherry cherry cherry shared")).toDF("doc_id", "text")
    val r = Search.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2),
        x.getDouble(3)))
    def idf(df: Int) = math.log(3.0 / df)
    def s6(tf: Int, df: Int) =
      BigDecimal(tf * idf(df)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    // doc 1: apple tf=2 df=1 → 2·ln3; banana tf=1 df=2 → ln1.5;
    // shared df=3 → idf 0 (never outranks a positive score)
    assert(r.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((1, "apple", s6(2, 1)), (2, "banana", s6(1, 2))))
    // doc 3: cherry tf=3 df=2 → 3·ln1.5 tops; then banana-vs-shared:
    // only 'shared' remains (score 0) → rank 2 = shared
    assert(r.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq ===
      Seq((1, "cherry"), (2, "shared")))
    // doc 2: banana and cherry both tf=1 df=2 — identical score, the
    // tie breaks lexicographically: banana before cherry
    assert(r.filter(_._1 == 2L).map(t => (t._2, t._3)).toSeq ===
      Seq((1, "banana"), (2, "cherry")))
  }

  test("pmiCollocations: hand-checked scores over bigram-slot marginals, " +
      "minCount floor, ties break (w1, w2) asc") {
    val s = spark
    import s.implicits._
    // bigrams: (a b) x3, (b a) x2, (c d) x3  [from "a b a b a b" style docs]
    val docs = Seq(
      (1L, "a b a b a b"),   // (a,b)x3 (b,a)x2
      (2L, "c d"), (3L, "c d"), (4L, "c d")).toDF("doc_id", "text")
    val r = Search.pmiCollocations(docs, "text", minCount = 2L, k = 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getDouble(3)))
    // N = 8 bigram slots. c(a,·)=3 c(·,b)=3 c(a,b)=3 → pmi = ln(8*3/9)
    // c(b,·)=2 c(·,a)=2 c(b,a)=2 → ln(8*2/4)=ln4
    // c(c,·)=3 c(·,d)=3 c(c,d)=3 → ln(8/3)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq === Seq(
      ("b", "a", 2L, r6(math.log(4.0))),
      ("a", "b", 3L, r6(math.log(8.0 / 3))),
      ("c", "d", 3L, r6(math.log(8.0 / 3)))))
  }

  test("pmiCollocations: minCount filters hapax pairs; k caps output") {
    val s = spark
    import s.implicits._
    val docs = ((1 to 50).map(i => (i.toLong, s"x$i y$i")) ++
      (51 to 60).map(i => (i.toLong, "p q"))).toDF("doc_id", "text")
    val r = Search.pmiCollocations(docs, "text", minCount = 2L, k = 10)
      .collect()
    // only (p,q) clears the floor — all x_i y_i are singletons
    assert(r.length === 1)
    assert(r(0).getString(0) === "p" && r(0).getString(1) === "q")
  }

  test("tfidfTopTerms: randomized battery vs brute-force scoring with " +
      "the round-6-before-rank convention") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 55)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
        "zeta", "eta", "theta")
      val docs = (1 to 60).map(i => (i.toLong,
        (1 to rnd.nextInt(8) + 2).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val got = Search.tfidfTopTerms(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getString(2), r.getDouble(3))).toMap
      // brute
      val tf = docs.flatMap { case (id, t) =>
        t.split(" ").groupBy(identity).map { case (w, ws) =>
          (id, w, ws.length) } }
      val dfm = tf.groupBy(_._2).view.mapValues(_.size).toMap
      val nd = docs.size.toDouble
      def r6(x: Double) = BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      docs.foreach { case (id, _) =>
        val scored = tf.filter(_._1 == id).map { case (_, w, f) =>
          (w, r6(f * math.log(nd / dfm(w)))) }
          .sortBy { case (w, sc) => (-sc, w) }
        scored.take(2).zipWithIndex.foreach { case ((w, sc), i) =>
          assert(got((id, i + 1)) === ((w, sc)),
            s"seed=$seed doc $id rank ${i + 1}")
        }
      }
    }
  }

  test("tfidfTopTerms: k caps per-doc output; every doc emits") {
    val s = spark
    import s.implicits._
    val docs = (1L to 30L).map(i =>
      (i, (0 until 10).map(j => s"w${(i + j) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Search.tfidfTopTerms(docs, "doc_id", "text", k = 3)
    val perDoc = r.groupBy("doc_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(perDoc.size === 30)
    assert(perDoc.values.forall(_ <= 3))
  }

  test("cTfIdfTopTerms: hand-checked score, distinctive terms rank first") {
    val s = spark
    import s.implicits._
    val docs = Seq(("A", "x x y"), ("B", "y z")).toDF("cls", "text")
    val r = Search.cTfIdfTopTerms(docs, "cls", "text", k = 3)
      .collect()
      .map(x => (x.getString(0), x.getString(2)) ->
        (x.getInt(1), x.getLong(3), x.getDouble(4))).toMap
    // totals: 5 tokens, 2 classes → A = 2.5; f: x=2, y=2, z=1
    // score(A, x) = 2·ln(1 + 2.5/2) = 2·ln(2.25) = 1.62186
    assert(r(("A", "x")) === ((1, 2L, 1.62186)))
    // score(B, z) = 1·ln(1 + 2.5) = 1.252763
    assert(r(("B", "z")) === ((1, 1L, 1.252763)))
    // the shared term y scores ln(2.25) ≈ 0.810930 in both classes
    assert(r(("A", "y"))._3 === 0.81093)
    assert(r(("B", "y"))._1 === 2)
  }

  test("rrfFuse: fused score is the exact reciprocal-rank sum; " +
      "absent legs contribute 0 and surface rank 0") {
    val s = spark
    import s.implicits._
    val legA = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val legB = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = Search.rrfFuse(Seq(legA, legB), "id", "rank", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    def c(r: Long): Double = 1.0 / (60.0 + r)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // both-leg doc first, then the single-leg docs by their rank's
    // reciprocal: 1/61 > 1/62 > 1/63
    assert(out.map(_._1) === Seq(2L, 1L, 4L, 3L))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(2L)._2 === r6(c(2L) + c(1L)))
    assert(m(1L)._2 === r6(c(1L)))
    assert((m(2L)._3, m(2L)._4) === ((2L, 1L)))
    // absent from legB → cos-side rank 0, contribution exactly 0
    assert((m(1L)._3, m(1L)._4) === ((1L, 0L)))
    assert((m(4L)._3, m(4L)._4) === ((0L, 2L)))
  }

  test("rrfFuse: leg order permutes the rank columns but neither " +
      "membership nor fused scores; topK bounds the output") {
    val s = spark
    import s.implicits._
    val legA = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val legB = Seq((2L, 1L), (4L, 2L), (5L, 3L)).toDF("id", "rank")
    val ab = Search.rrfFuse(Seq(legA, legB), "id", "rank", 60, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ba = Search.rrfFuse(Seq(legB, legA), "id", "rank", 60, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ab === ba)
    val top2 = Search.rrfFuse(Seq(legA, legB), "id", "rank", 60, 2).collect()
    assert(top2.map(_.getLong(0)).toSeq === ab.map(_._1).take(2))
  }

  test("rrfFuse: randomized differential against a local fold (2-4 " +
      "legs, shared-and-disjoint ids, k0 sweep)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1709)
    (1 to 15).foreach { _ =>
      val nLegs = 2 + rnd.nextInt(3)
      val k0 = Seq(10, 60, 100)(rnd.nextInt(3))
      val legs = (0 until nLegs).map { _ =>
        val ids = rnd.shuffle((1L to 30L).toList).take(5 + rnd.nextInt(10))
        ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      }
      val got = Search.rrfFuse(legs.map(_.toDF("id", "rank")), "id",
          "rank", k0, topK = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // local fold: same left-to-right contribution order
      val byId = legs.zipWithIndex.flatMap { case (l, li) =>
        l.map { case (id, r) => id -> (li, r) } }.groupBy(_._1)
      // order on the EXACT score (what rrfFuse sorts on), round after
      val want = byId.map { case (id, rs) =>
        val perLeg = rs.map(_._2).toMap
        val score = (0 until nLegs).foldLeft(0.0) { (acc, li) =>
          acc + perLeg.get(li).map(r => 1.0 / (k0 + r.toDouble)).getOrElse(0.0) }
        (id, score)
      }.toSeq.sortBy { case (id, sc) => (-sc, id) }
        .map { case (id, sc) => (id, BigDecimal(sc)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      assert(got === want)
    }
  }

  test("rrfFuse: ties on the exact fused score break by id ascending") {
    val s = spark
    import s.implicits._
    // ids 5 and 3 each hold rank 1 in exactly one leg → identical score
    val legA = Seq((5L, 1L)).toDF("id", "rank")
    val legB = Seq((3L, 1L)).toDF("id", "rank")
    val out = Search.rrfFuse(Seq(legA, legB), "id", "rank", 60, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(3L, 5L))
  }

  test("cTfIdfTopTerms: k bounds the per-class list, rank dense from 1") {
    val s = spark
    import s.implicits._
    val docs = Seq(("A", "a b c d e"), ("B", "f g")).toDF("cls", "text")
    val rows = Search.cTfIdfTopTerms(docs, "cls", "text", k = 2).collect()
    val byClass = rows.groupBy(_.getString(0))
    assert(byClass("A").map(_.getInt(1)).sorted.toSeq === Seq(1, 2))
    assert(byClass("B").map(_.getInt(1)).sorted.toSeq === Seq(1, 2))
  }
}
