package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evaluation + diversified-selection operators ([[Eval]]):
  * recall@k scoring, sufficient-statistics silhouette (cross-checked
  * against an all-pairs brute force on the same quantized integers),
  * and greedy MMR selection — plus the plan shapes that keep them
  * corpus-scale (broadcast-sized joins, no all-pairs).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // --- recallAtK ---------------------------------------------------------

  test("recallAtK: per-query hit fractions, misses kept at zero") {
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)).toDF("qid", "nid", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 12L, 2), (1L, 99L, 3), // 2 of 3
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3)) // 0 of 3
      .toDF("qid", "nid", "rank")
    val r = Eval.recallAtK(truth, approx, k = 3)
      .orderBy("qid").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 0L)))
    assert(r(0).getDouble(2) === 0.666667)
    assert(r(1).getDouble(2) === 0.0)
  }

  test("recallAtK: rank filter restricts both sides to top-k") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("qid", "nid", "rank")
    // approx found nid=11 but only at rank 3 — with k=2 it must not count
    val approx = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3))
      .toDF("qid", "nid", "rank")
    val r = Eval.recallAtK(truth, approx, k = 2).collect()
    assert(r.head.getLong(1) === 1L)
    assert(r.head.getDouble(2) === 0.5)
  }

  test("recallAtK: the denominator is the PER-QUERY truth-set size — a " +
      "query with fewer than k true neighbors reaches recall 1.0 when " +
      "the approximation finds them all") {
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2),          // only 2 true neighbors
      (2L, 20L, 1))                        // only 1 true neighbor
      .toDF("qid", "nid", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3), // found both
      (2L, 98L, 1), (2L, 20L, 2), (2L, 97L, 3)) // found the one
      .toDF("qid", "nid", "rank")
    val r = Eval.recallAtK(truth, approx, k = 3)
      .orderBy("qid").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
      === Seq((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  // --- classificationReport ----------------------------------------------

  test("classificationReport: hand-checked precision/recall/F1") {
    val conf = Seq((0, 0, 8L), (0, 1, 2L), (1, 1, 9L), (1, 0, 1L),
      (2, 2, 5L)).toDF("label", "pred", "n")
    val r = Eval.classificationReport(conf).orderBy("label").collect()
    // label 0: support 10, predicted 9, tp 8
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) ===
      ((10L, 9L, 8L)))
    assert(r(0).getDouble(4) === 0.888889) // 8/9
    assert(r(0).getDouble(5) === 0.8)
    assert(r(0).getDouble(6) === 0.842105) // 2pr/(p+r)
    // label 2: perfect
    assert((r(2).getDouble(4), r(2).getDouble(5), r(2).getDouble(6)) ===
      ((1.0, 1.0, 1.0)))
  }

  test("classificationReport: never-predicted class scores 0 without NaN") {
    val conf = Seq((0, 1, 5L), (1, 1, 5L)).toDF("label", "pred", "n")
    val r = Eval.classificationReport(conf).orderBy("label").collect()
    assert((r(0).getLong(2), r(0).getDouble(4), r(0).getDouble(5),
      r(0).getDouble(6)) === ((0L, 0.0, 0.0, 0.0)))
    assert((r(1).getDouble(4), r(1).getDouble(5)) === ((0.5, 1.0)))
    assert(r(1).getDouble(6) === 0.666667)
  }

  // --- silhouette --------------------------------------------------------

  /** All-pairs reference silhouette over the SAME ⌊x·10⁶⌋ quantized
    * integers and squared Euclidean distance the operator uses. */
  private def bruteSilhouette(pts: Seq[(Long, Int, Seq[Double])])
      : Map[Long, Double] = {
    val q = pts.map { case (id, cl, v) =>
      (id, cl, v.map(x => math.floor(x * 1e6).toLong)) }
    def d2(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => ((x - y) * (x - y)).toDouble }.sum
    q.map { case (id, cl, u) =>
      val own = q.filter(p => p._2 == cl && p._1 != id)
      val s = if (own.isEmpty) 0.0 else {
        val a = own.map(p => d2(u, p._3)).sum / own.size
        val b = q.map(_._2).distinct.filter(_ != cl).map { c =>
          val m = q.filter(_._2 == c)
          m.map(p => d2(u, p._3)).sum / m.size
        }.min
        if (math.max(a, b) <= 0.0) 0.0 else (b - a) / math.max(a, b)
      }
      id -> (math.rint(s * 1e6) / 1e6 + 0.0)
    }.toMap
  }

  test("silhouette matches the all-pairs brute force on quantized ints") {
    val pts = Seq(
      (1L, 0, Seq(0.10, 0.20)), (2L, 0, Seq(0.12, 0.21)),
      (3L, 0, Seq(0.09, 0.18)),
      (4L, 1, Seq(0.90, 0.80)), (5L, 1, Seq(0.88, 0.83)),
      (6L, 2, Seq(0.50, 0.52)), (7L, 2, Seq(0.47, 0.50)),
      (8L, 2, Seq(0.51, 0.49)))
    val df = pts.toDF("id", "cl", "v")
      .select(col("id"), col("cl"), col("v").cast("array<float>").as("v"))
    val got = Eval.silhouette(df, "id", "cl", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = bruteSilhouette(pts)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 2e-6, s"point $id: got ${got(id)}, want $w")
  }

  test("silhouette randomized differential: 60 seeded points, 5 clusters") {
    val rnd = new scala.util.Random(20260815L)
    val pts = (1L to 60L).map { id =>
      (id, rnd.nextInt(5), Seq.fill(8)(rnd.nextDouble() * 2 - 1)) }
    val df = pts.toDF("id", "cl", "v")
      .select(col("id"), col("cl"), col("v").cast("array<float>").as("v"))
    // quantization sees the FLOAT-rounded values the operator reads
    val ptsF = pts.map { case (id, cl, v) =>
      (id, cl, v.map(_.toFloat.toDouble)) }
    val got = Eval.silhouette(df, "id", "cl", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = bruteSilhouette(ptsF)
    for ((id, w) <- want)
      assert(math.abs(got(id) - w) < 2e-6, s"point $id: got ${got(id)}, want $w")
  }

  test("silhouette: singleton cluster scores 0; separated clusters near 1") {
    val pts = Seq(
      (1L, 0, Seq(0.0, 0.0)), (2L, 0, Seq(0.001, 0.0)),
      (3L, 1, Seq(1.0, 1.0)), (4L, 1, Seq(0.999, 1.0)),
      (5L, 2, Seq(0.5, 0.5))) // singleton
    val df = pts.toDF("id", "cl", "v")
      .select(col("id"), col("cl"), col("v").cast("array<float>").as("v"))
    val got = Eval.silhouette(df, "id", "cl", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(5L) === 0.0)
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(got(id) > 0.99, s"tight separated point $id: ${got(id)}")
  }

  test("silhouette plan: corpus joins only the broadcast k-row stats grid") {
    val df = Seq((1L, 0, Seq(0.1, 0.2)), (2L, 1, Seq(0.9, 0.8)))
      .toDF("id", "cl", "v")
      .select(col("id"), col("cl"), col("v").cast("array<float>").as("v"))
    val p = Eval.silhouette(df, "id", "cl", "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "stats grid must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "no corpus-sized shuffle join anywhere in silhouette")
  }

  // --- naiveBayesConfusion -------------------------------------------------

  test("naiveBayesConfusion: disjoint vocabularies classify perfectly") {
    val docs = Seq(
      (1L, "sport", Seq("goal", "match", "team")),
      (2L, "sport", Seq("team", "goal", "win")),
      (3L, "tech", Seq("code", "spark", "shuffle")),
      (4L, "tech", Seq("spark", "plan", "code"))).toDF("id", "cls", "w")
    val conf = Eval.naiveBayesConfusion(docs, "id", "cls", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(conf === Map(("sport", "sport") -> 2L, ("tech", "tech") -> 2L))
  }

  test("naiveBayesConfusion: priors break symmetric likelihoods") {
    // doc 5's words appear once in each class; the majority class wins
    // on the prior (and smoothing over the larger class total)
    val docs = Seq(
      (1L, "a", Seq("x", "p")), (2L, "a", Seq("x", "q")),
      (3L, "a", Seq("x", "r")),
      (4L, "b", Seq("y", "s")),
      (5L, "b", Seq("x", "x"))).toDF("id", "cls", "w")
    val conf = Eval.naiveBayesConfusion(docs, "id", "cls", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // class a holds 3 of 4 'x' occurrences + the 3/5 prior: doc 5
    // (all-x) must be pulled to a — a misclassification the confusion
    // matrix reports off-diagonal
    assert(conf(("b", "a")) >= 1L)
  }

  // --- LSH banding S-curve -------------------------------------------------

  test("LSH banding: empirical candidate recall tracks 1-(1-J^4)^16") {
    // planted pairs at controlled shingle-Jaccard: doc and twin share
    // the first s of 42 words (tails pair-unique), so both have 40
    // trigram shingles of which s-2 are shared → J = (s-2)/(82-s)
    val n = 42
    val sVals = Seq(10, 20, 28, 34, 38, 40)
    val pairsPerS = 25
    val docs = (for {
      s <- sVals; i <- 0 until pairsPerS
      side <- Seq("a", "b")
    } yield {
      val pid = s * 1000 + i
      val shared = (0 until s).map(j => s"w${pid}_$j")
      val tail = (s until n).map(j => s"$side${pid}_$j")
      val id = pid.toLong * 10 + (if (side == "a") 0 else 1)
      (id, (shared ++ tail).mkString(" "))
    }).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
        graft.functions.NativeText.minhashSig(
          split(col("text"), " "), 3).as("sig"))
      .where(size(col("sig")) > 0)
    val cands = TextDedup.lshCandidates(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def hitRate(s: Int): Double = {
      val hits = (0 until pairsPerS).count { i =>
        val a = (s * 1000 + i).toLong * 10
        cands.contains((a, a + 1))
      }
      hits.toDouble / pairsPerS
    }
    def analytic(s: Int): Double = {
      val j = (s - 2).toDouble / (82 - s)
      1.0 - math.pow(1.0 - math.pow(j, 4), 16)
    }
    // high end: J≈0.90/0.82 → analytic ≈ 1.0 — must be found
    assert(hitRate(40) >= 0.95, s"J=0.905: ${hitRate(40)}")
    assert(hitRate(38) >= 0.9, s"J=0.818: ${hitRate(38)}")
    // low end: J≈0.11 → analytic ≈ 0.002 — must (almost) never collide
    assert(hitRate(10) <= 0.2, s"J=0.111: ${hitRate(10)}")
    // the curve is monotone in J (allow one-step sampling wiggle)
    val rates = sVals.map(hitRate)
    rates.sliding(2).zip(sVals.sliding(2)).foreach { case (Seq(lo, hi), Seq(sl, sh)) =>
      assert(hi >= lo - 0.2, s"s=$sl→$sh: $lo → $hi not ~monotone")
    }
    // mid-curve agreement with the analytic band curve within binomial
    // noise (25 pairs → σ ≈ 0.1)
    for (s <- Seq(28, 34))
      assert(math.abs(hitRate(s) - analytic(s)) <= 0.3,
        s"s=$s: empirical ${hitRate(s)} vs analytic ${analytic(s)}")
  }

  // --- mmrSelect ---------------------------------------------------------

  test("mmrSelect diversifies: near-duplicate of pick 1 is deferred") {
    // q is closest to a and a2 (near-identical); plain top-3 would pick
    // a, a2, b — MMR must interleave the diverse b before the near-dup a2.
    val corpus = Seq(
      (100L, Seq(1.0, 0.0)),          // a
      (101L, Seq(0.9999, 0.0001)),    // a2 ~ a
      (102L, Seq(0.72, 0.70)),        // b: diverse, still similar to q
      (103L, Seq(-1.0, 0.2)))         // far
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val queries = Seq((1L, Seq(0.98, 0.05))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // λ=0.5: a2 wins round 1 (cos 0.998711 vs a's 0.998706), then the
    // ~1.0 penalty on a (0.5·0.99871−0.5·0.99995 < 0) defers it behind
    // the diverse b (0.5·0.75157−0.5·0.71707 > 0); a returns at pick 3.
    val picks = Eval.mmrSelect(corpus, queries, k = 3, m = 4, lambda = 0.5)
      .orderBy("pick").collect().map(_.getLong(1)).toSeq
    assert(picks === Seq(101L, 102L, 100L))
  }

  test("intraListDiversity: MMR picks beat same-k plain top-k ILD") {
    val corpus = Seq(
      (100L, Seq(1.0, 0.0)), (101L, Seq(0.9999, 0.0001)),
      (102L, Seq(0.72, 0.70)), (103L, Seq(-1.0, 0.2)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val queries = Seq((1L, Seq(0.98, 0.05))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val mmr = Eval.mmrSelect(corpus, queries, k = 3, m = 4, lambda = 0.5)
      .select(col("qid"), col("nid"))
    val topk = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select(col("qid"), col("nid"))
    def ild(p: org.apache.spark.sql.DataFrame): Double =
      Eval.intraListDiversity(p, corpus).collect().head.getDouble(1)
    // topk = {a, a2, b} (two near-identical picks); mmr = {a2, b, a}…
    // same set here, so construct the contrast via k=2: mmr {a2, b}
    // vs topk {a, a2}
    val mmr2 = Eval.mmrSelect(corpus, queries, k = 2, m = 4, lambda = 0.5)
      .select(col("qid"), col("nid"))
    val topk2 = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .select(col("qid"), col("nid"))
    assert(ild(mmr2) > ild(topk2),
      s"mmr ILD ${ild(mmr2)} must beat topk ILD ${ild(topk2)}")
    assert(ild(mmr) === ild(topk), "same 3-element set → same ILD")
  }

  test("mmrSelect: pick 1 is the plain argmax, scores weakly decrease") {
    val corpus = Seq(
      (10L, Seq(0.3, 0.7)), (11L, Seq(0.5, 0.5)), (12L, Seq(0.9, 0.1)),
      (13L, Seq(0.2, 0.2)), (14L, Seq(0.6, 0.35)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val queries = Seq((1L, Seq(0.55, 0.45))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val rows = Eval.mmrSelect(corpus, queries, k = 3, m = 5, lambda = 0.75)
      .orderBy("pick").collect()
    assert(rows.head.getLong(1) === 11L, "pick 1 = cosine argmax")
    // λ·sim − (1−λ)·pen can only shrink as the selected set grows
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores === scores.sorted.reverse, s"non-increasing: $scores")
  }

  // --- perplexityBuckets / bpeMergeCandidates ----------------------------

  test("perplexityBuckets: per-language terciles, head outscores tail") {
    val docs = (0 until 30).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // vary repetitiveness so LM scores spread: low i → common bigrams
      val w = (0 to 5).map(j => s"w${(i * (j + 1)) % (3 + i / 3)}")
      (i.toLong, lang, w)
    }.toDF("doc_id", "lang", "w")
    val b = Corpus.perplexityBuckets(docs, "doc_id", "lang", "w")
    val byLang = b.groupBy("lang", "bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (l <- Seq("en", "de"); bk <- Seq("head", "middle", "tail"))
      assert(byLang((l, bk)) === 5L, s"$l/$bk tercile of 15")
    val stats = b.groupBy("lang", "bucket").agg(avg("avg_logprob").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (l <- Seq("en", "de"))
      assert(stats((l, "head")) > stats((l, "tail")),
        s"$l: head mean logprob must exceed tail")
  }

  test("bpeMergeCandidates: corpus-weighted pair counts, hand-checked") {
    val docs = Seq("aab aab ab", "aab x").toDF("text")
    // words: aab ×3, ab ×1, x ×1 (len<2 dropped)
    // pairs: aa ← 3 (from aab), ab ← 3 (aab) + 1 (ab) = 4
    val r = Corpus.bpeMergeCandidates(docs, "text", k = 10).collect()
    val m = r.map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(m(("a", "b")) === 4L)
    assert(m(("a", "a")) === 3L)
    assert(r.head.getString(0) === "a" && r.head.getString(1) === "b",
      "most frequent pair ranks first")
  }

  test("bpeMergeCandidates plan: explode runs over the vocab, not the corpus") {
    val docs = Seq("aa bb", "aa cc").toDF("text")
    val p = Corpus.bpeMergeCandidates(docs, "text", k = 5)
      .queryExecution.optimizedPlan.toString
    // the pair explode must sit ABOVE the word-frequency aggregate
    // (vocab-sized input), not directly over the corpus scan
    val genIdx = p.indexOf("Generate explode(transform(sequence")
    val aggIdx = p.lastIndexOf("Aggregate")
    assert(genIdx >= 0, s"pair explode present:\n$p")
    assert(aggIdx > genIdx,
      s"word-count aggregate must feed the pair explode:\n$p")
  }

  // --- corpusBleu --------------------------------------------------------

  test("corpusBleu: clipping, bigram order sensitivity, and the " +
      "hand-checked textbook pair") {
    val pairs = Seq(
      // p1 = 5/6 (the×2 clipped at 2, sat misses), p2 = 3/5, bp = 1
      ("g1", 1L, "the cat sat on the mat", "the cat is on the mat"),
      // repetition clipped hard: p1 = 1/4, p2 = 0 → bleu 0
      ("g2", 2L, "a a a a", "a b")).toDF("grp", "pid", "cand", "ref")
    val r = Eval.corpusBleu(pairs, "grp", "pid", "cand", "ref")
      .orderBy("grp").collect()
    assert(r(0).getDouble(1) === 0.833333) // p1
    assert(r(0).getDouble(2) === 0.6)      // p2
    assert(r(0).getDouble(3) === 1.0)      // bp
    assert(r(0).getDouble(4) === 0.707107) // sqrt(5/6 * 3/5) = sqrt(.5)
    assert(r(1).getDouble(1) === 0.25 && r(1).getDouble(4) === 0.0)
  }

  test("corpusBleu: brevity penalty fires on short candidates, and " +
      "corpus-level sums pool pairs before dividing") {
    val short = Seq(("g", 1L, "x y", "x y z w")).toDF("grp", "pid", "cand", "ref")
    val r1 = Eval.corpusBleu(short, "grp", "pid", "cand", "ref")
      .collect().head
    assert(r1.getDouble(3) === 0.367879) // exp(1 - 4/2)
    assert(r1.getDouble(4) === 0.367879) // p1 = p2 = 1

    // two pairs pooled: clipped 2+0 over totals 2+2 → p1 = 0.5, NOT the
    // mean of per-pair precisions (1.0 and 0.0) — the corpus-BLEU
    // distinction this operator exists for; per-pair keying means the
    // duplicate-free id space is load-bearing, so ids differ
    val pooled = Seq(("g", 1L, "x y", "x y"), ("g", 2L, "p q", "a b"))
      .toDF("grp", "pid", "cand", "ref")
    val r2 = Eval.corpusBleu(pooled, "grp", "pid", "cand", "ref")
      .collect().head
    assert(r2.getDouble(1) === 0.5)

    // disjoint vocabularies: the clip side is EMPTY after the inner
    // join — the left join + fill keeps the group with p = 0
    val none = Seq(("g", 1L, "p q", "a b")).toDF("grp", "pid", "cand", "ref")
    val r3 = Eval.corpusBleu(none, "grp", "pid", "cand", "ref")
      .collect().head
    assert(r3.getDouble(1) === 0.0 && r3.getDouble(4) === 0.0)

    // a group of single-token candidates has zero bigram slots:
    // p2 and bleu are 0 by convention, never NaN
    val mono = Seq(("g", 1L, "x", "x")).toDF("grp", "pid", "cand", "ref")
    val r4 = Eval.corpusBleu(mono, "grp", "pid", "cand", "ref")
      .collect().head
    assert(r4.getDouble(1) === 1.0)
    assert(r4.getDouble(2) === 0.0 && r4.getDouble(4) === 0.0)
  }

  // --- rankBiasedOverlap -------------------------------------------------

  test("rankBiasedOverlap: identical rankings score exactly 1, disjoint " +
      "score 0 (query kept), partial agreement matches a plain replay") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3)).toDF("qid", "nid", "rank")
    val b = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),   // identical
      (2L, 98L, 1), (2L, 97L, 2), (2L, 96L, 3),   // disjoint
      (3L, 31L, 1), (3L, 30L, 2), (3L, 99L, 3))   // top-2 swapped
      .toDF("qid", "nid", "rank")
    val r = Eval.rankBiasedOverlap(a, b, k = 3, p = 0.9)
      .orderBy("qid").collect()
    assert(r(0).getLong(1) === 3L && r(0).getDouble(2) === 1.0)
    assert(r(1).getLong(1) === 0L && r(1).getDouble(2) === 0.0)
    // q3: items 30 and 31 both have max(ra, rb) = 2 → A_1 = 0,
    // A_2 = A_3 = 2; replay the definition directly
    val p = 0.9; val c = (1 - p) / (1 - math.pow(p, 3))
    val exp = c * Seq(0.0 / 1, 2.0 / 2 * p, 2.0 / 3 * p * p).sum
    assert(r(2).getLong(1) === 2L)
    assert(r(2).getDouble(2) === BigDecimal(exp)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rankBiasedOverlap: ranks beyond k on either side do not " +
      "contribute") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "nid", "rank")
    val b = Seq((1L, 10L, 1), (1L, 11L, 5)).toDF("qid", "nid", "rank")
    // with k = 2, item 11 sits at rank 5 on b's side — excluded
    val r = Eval.rankBiasedOverlap(a, b, k = 2, p = 0.9)
      .collect().head
    assert(r.getLong(1) === 1L)
    val p = 0.9; val c = (1 - p) / (1 - p * p)
    val exp = c * (1.0 / 1 + 1.0 / 2 * p) // item 10 from depth 1
    assert(r.getDouble(2) === BigDecimal(exp)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // --- fleissKappa -------------------------------------------------------

  test("fleissKappa: the Fleiss (1971) worked example — 10 subjects, " +
      "14 raters, 5 categories") {
    val nij = Seq(
      (1, Seq(0, 0, 0, 0, 14)), (2, Seq(0, 2, 6, 4, 2)),
      (3, Seq(0, 0, 3, 5, 6)), (4, Seq(0, 3, 9, 2, 0)),
      (5, Seq(2, 2, 8, 1, 1)), (6, Seq(7, 7, 0, 0, 0)),
      (7, Seq(3, 2, 6, 3, 0)), (8, Seq(2, 5, 3, 2, 2)),
      (9, Seq(6, 5, 2, 1, 0)), (10, Seq(0, 2, 2, 3, 7)))
    val ratings = nij.flatMap { case (it, cs) =>
      cs.zipWithIndex.flatMap { case (n, j) => Seq.fill(n)((it, s"c$j")) }
    }.toDF("item", "cat")
    // independent plain-Scala replay of the definition
    val pbar = nij.map { case (_, cs) =>
      cs.map(n => n * (n - 1)).sum.toDouble / (14 * 13)
    }.sum / 10
    val tot = nij.flatMap(_._2).sum.toDouble
    val pe = (0 until 5)
      .map(j => nij.map(_._2(j)).sum / tot).map(p => p * p).sum
    val exp = BigDecimal((pbar - pe) / (1 - pe))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Eval.fleissKappa(ratings, "item", "cat").collect().head
    assert(r.getLong(0) === 10L && r.getLong(1) === 140L)
    assert(r.getDouble(4) === exp)
    assert(math.abs(r.getDouble(4) - 0.210) < 0.001) // the published value
  }

  test("fleissKappa: single-rating items are excluded from agreement " +
      "but still feed the marginals") {
    val ratings = Seq(
      (1, "a"), (1, "a"), (2, "b"), (2, "b"), // two unanimous items
      (3, "c"))                               // one single-rating item
      .toDF("item", "cat")
    val r = Eval.fleissKappa(ratings, "item", "cat").collect().head
    assert(r.getLong(0) === 2L, "items with ni >= 2")
    assert(r.getLong(1) === 5L, "all ratings count in the marginals")
    assert(r.getDouble(2) === 1.0, "unanimous pairs: p_bar = 1")
    // pe = (2/5)^2 + (2/5)^2 + (1/5)^2 = 0.36; kappa = (1-.36)/(1-.36)
    assert(r.getDouble(3) === 0.36 && r.getDouble(4) === 1.0)
  }

  test("fleissKappa: a unanimous single-category log (pe = 1) has " +
      "undefined kappa — NULL, not NaN") {
    val ratings = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a"))
      .toDF("item", "cat")
    val r = Eval.fleissKappa(ratings, "item", "cat").collect().head
    assert(r.getDouble(3) === 1.0, "pe = 1 with one category")
    assert(r.isNullAt(4), "kappa is 0/0 — pinned to NULL on both engines")
  }

  // --- alignmentUniformity -----------------------------------------------

  test("alignmentUniformity: hand-checked on axis vectors — aligned " +
      "positives score 0, the uniformity term matches the closed form") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "e")
    val pos = Seq((1L, 2L), (1L, 3L)).toDF("aid", "bid")
    val r = Eval.alignmentUniformity(corpus, pos, corpus).collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
    // alignment: d2(1,2) = 0, d2(1,3) = 2 → mean 1
    assert(r.getDouble(2) === 1.0)
    // uniformity over all 3 pairs: exp(0), exp(-4), exp(-4)
    val exp = math.log((1.0 + 2 * math.exp(-4.0)) / 3.0)
    assert(r.getDouble(3) === BigDecimal(exp)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a collapsed space scores uniformity 0 — the degeneracy signal
    val flat = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("id", "e")
    val r2 = Eval.alignmentUniformity(flat,
      Seq((1L, 2L)).toDF("aid", "bid"), flat).collect().head
    assert(r2.getDouble(3) === 0.0)
  }

  // --- aucFromLevels -----------------------------------------------------

  test("aucFromLevels: perfect separation scores 1, inverted scores 0, " +
      "an uninformative scorer (all one level) scores 0.5 by the tie " +
      "term, and a mixed case matches the hand pair count") {
    def auc(rows: Seq[(Int, Boolean)]): (Long, Long, Double) = {
      val r = Eval.aucFromLevels(rows.toDF("level", "hit"), "level", "hit")
        .collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    assert(auc(Seq((1, false), (2, false), (3, true), (4, true))) ===
      ((2L, 2L, 1.0)))
    assert(auc(Seq((4, false), (3, false), (2, true), (1, true)))._3 === 0.0)
    assert(auc(Seq((7, true), (7, false), (7, true), (7, false)))._3 === 0.5)
    // mixed with ties: pos at {3, 2}, neg at {2, 1}
    //   pairs won: (3>2), (3>1), (2>1) = 3; tied: (2,2) = 1 → ½
    //   AUC = 3.5 / 4
    assert(auc(Seq((3, true), (2, true), (2, false), (1, false)))._3
      === 0.875)
  }

  test("aucFromLevels: a single-class input (P = 0 or N = 0) has " +
      "undefined AUC — NULL, not NaN/inf") {
    def row(rows: Seq[(Int, Boolean)]) =
      Eval.aucFromLevels(rows.toDF("level", "hit"), "level", "hit")
        .collect().head
    val allPos = row(Seq((1, true), (2, true)))
    assert(allPos.getLong(0) === 2L && allPos.getLong(1) === 0L &&
      allPos.isNullAt(2))
    val allNeg = row(Seq((1, false), (2, false)))
    assert(allNeg.getLong(0) === 0L && allNeg.getLong(1) === 2L &&
      allNeg.isNullAt(2))
  }

  // --- calibrationBins ---------------------------------------------------

  test("calibrationBins: binning, top-edge fold, and the weighted " +
      "ECE contributions, hand-checked") {
    val scored = Seq(
      (0.05, true), (0.08, false),   // bin 0: conf .065, acc .5
      (0.95, true), (1.0, true),     // bin 9 (1.0 folds in): acc 1
      (0.55, false))                 // bin 5: acc 0
      .toDF("conf", "hit")
    val r = Eval.calibrationBins(scored, "conf", "hit", bins = 10)
      .orderBy("bin").collect()
    assert(r.map(_.getInt(0)).toSeq === Seq(0, 5, 9))
    val b0 = r(0)
    assert(b0.getLong(1) === 2L && b0.getDouble(2) === 0.065 &&
      b0.getDouble(3) === 0.5)
    assert(b0.getDouble(4) === 0.174) // 2/5 * |.5 - .065|
    val b9 = r(2)
    assert(b9.getLong(1) === 2L && b9.getDouble(2) === 0.975 &&
      b9.getDouble(3) === 1.0)
    assert(b9.getDouble(4) === 0.01) // 2/5 * |1 - .975|
  }
}
