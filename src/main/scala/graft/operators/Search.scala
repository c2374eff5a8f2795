package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked fulltext search — the relevance half of the reference's search
  * surface. The reference's API returns Elasticsearch-scored hits in
  * `_score` order (search.py builds the ES query, ES ranks with BM25,
  * its default similarity); the Query Format DSL compiler here
  * reproduces the *filter* semantics, and this operator reproduces the
  * *ranking*: Lucene/ES practical BM25 with the published constants
  * k1 = 1.2, b = 0.75 and idf = ln(1 + (N − df + ½)/(df + ½)).
  *
  * Shape at 100 TB: scoring needs only per-document term frequencies
  * for the handful of query terms — NOT an inverted index — so the plan
  * is one corpus scan computing (dl, tf…) per row, a single scalar
  * aggregate for the corpus statistics (N, Σdl, df per term) that comes
  * back as a broadcast 1-row join, and a global top-k that Catalyst
  * executes as TakeOrderedAndProject (per-partition heaps + driver
  * merge of k rows, never a full sort). Zero wide shuffles.
  *
  * Determinism across engines: term scores are materialized as one
  * column per query term and added left-to-right in a fixed order, so
  * the double summation order is identical in Spark and the DuckDB
  * oracle; `ln` is the only libm call and the final score is rounded
  * before comparison.
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** Per-term tf without a higher-order function (HOF `filter` is
    * CodegenFallback): |w| − |array_remove(w, t)| stays inside
    * whole-stage codegen. */
  private def tf(words: Column, term: String): Column =
    (size(words) - size(array_remove(words, term))).cast("long")

  /** Top-k documents for `terms` by BM25, scored over
    * whitespace-tokenized lowercase `textCol`.
    *
    * @return (id, score_r6) — score rounded to 6 decimals; ties on the
    *   exact score break by id ascending.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val n = terms.size
    val staged = docs
      .select(col(idCol), split(lower(col(textCol)), " ").as("_w"))
      .select(
        col(idCol) +: size(col("_w")).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) => tf(col("_w"), t).as(s"tf_$i") }: _*)

    // Corpus statistics: one partial-aggregable scalar row, broadcast back.
    val statAggs = sum(col("dl")).as("sum_dl") +:
      (0 until n).map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = staged.agg(count(lit(1)).as("n_docs"), statAggs: _*)

    staged.crossJoin(broadcast(stats))
      .select(col(idCol), bm25ScoreSum(n).as("_score"))
      .filter(col("_score") > 0.0)
      .orderBy(col("_score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("_score"), 6).as("score_r6"))
  }

  /** The BM25 score sum over staged columns (`tf_i`, `df_i`, `dl`,
    * `n_docs`, `sum_dl`) — shared verbatim by the scan path
    * ([[bm25TopK]]) and the index path ([[indexSearch]]) so the two
    * are arithmetic-identical, including the fixed left-to-right
    * double summation order. */
  private def bm25ScoreSum(n: Int): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def termScore(i: Int): Column = {
      val tfd = col(s"tf_$i").cast("double")
      val idf = log(lit(1.0) +
        ((col("n_docs") - col(s"df_$i")).cast("double") + lit(0.5)) /
          (col(s"df_$i").cast("double") + lit(0.5)))
      when(col(s"tf_$i") > 0,
        idf * (tfd * lit(K1 + 1.0)) /
          (tfd + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") / avgdl)))
        .otherwise(lit(0.0))
    }
    (0 until n).map(termScore).reduceLeft(_ + _)
  }

  // --- materialized inverted index -----------------------------------

  /** Postings relation — the build half of the reference's whole
    * architecture (everything it ingests lands in an Elasticsearch
    * inverted index; elasticsearch.py's bulk indexer is the sink):
    * one row per (term, document) with the term frequency and the
    * document length DENORMALIZED in, Lucene-norms style, so a search
    * over the index never joins back to the corpus for lengths.
    *
    * Scale shape: tokenization is per-row scan work; the groupBy
    * (term, doc_id, dl) collapses each document's repeated terms
    * map-side (a document's tokens never leave their partition
    * unaggregated), so the single Exchange carries one row per
    * DISTINCT (term, doc) — the index's own size, not the token
    * stream's. */
  def invertedPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), " ").as("_w"))
      .select(col("doc_id"), size(col("_w")).cast("long").as("dl"),
        explode(col("_w")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus statistics the ranker needs at query time, precomputed at
    * build time: one row (n_docs, sum_dl). */
  def indexStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** Segment-sharded posting lists — the storage layout: postings of
    * one term grouped into sorted arrays per (term, shard) where
    * `shard = doc_id mod nShards`. The shard key is what bounds the
    * hot-term problem at 100 TB: a stopword's corpus-wide posting
    * list lands as nShards bounded arrays on nShards reducers instead
    * of one reducer materializing a corpus-sized list (the same
    * discipline as TextDedup.MaxBucketSize). Lucene's segment files
    * are the same idea with time-of-arrival sharding. */
  def invertedSegments(postings: DataFrame, nShards: Int): DataFrame =
    postings
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)).cast("int"))
      .groupBy(col("term"), col("shard"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("tf"), col("dl")))).as("postings"))

  /** Incremental index maintenance: merge a delta batch's segments
    * into an existing index — the streaming-ingest half of "build
    * once": nightly/continuous harvests index only their delta and
    * merge, never re-tokenizing the corpus (what the reference's ES
    * bulk indexer does on every harvest). Per (term, shard) the
    * posting arrays concatenate and re-sort — segment-local work, one
    * vocabulary-sized shuffle of the DELTA plus the touched segments.
    * Algebra (SearchSpec): mergeSegments(segments(A), segments(B)) ==
    * segments(A ∪ B) for disjoint doc sets, so merge order and
    * batching never change the index. */
  def mergeSegments(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("term"), col("shard"))
      .agg(sort_array(flatten(collect_list(col("postings"))))
        .as("postings"))

  /** BM25 top-k answered FROM the index — the "build once, query many"
    * path: query terms prune the postings scan (an `IN` filter the
    * parquet reader pushes down on a term-sorted/partitioned layout),
    * candidates pivot to one row per document with the same per-term
    * tf columns and fixed left-to-right score sum as [[bm25TopK]]
    * (double summation order identical ⇒ SearchSpec pins exact
    * equality), and corpus stats arrive as one broadcast row. Only
    * documents containing ≥1 query term are touched — the scan cost
    * is the matched postings, not the corpus. */
  def indexSearch(postings: DataFrame, stats: DataFrame,
      terms: Seq[String], k: Int): DataFrame = {
    val n = terms.size
    val matched = postings.filter(col("term").isin(terms: _*))
    val dfRow = matched
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .agg(map_from_entries(collect_list(struct(col("term"), col("df"))))
        .as("_dfs"))
      .select((0 until n).map(i =>
        coalesce(element_at(col("_dfs"), lit(terms(i))), lit(0L))
          .as(s"df_$i")): _*)
    val tfAggs = (0 until n).map(i =>
      coalesce(max(when(col("term") === terms(i), col("tf"))), lit(0L))
        .as(s"tf_$i"))
    val cand = matched
      .groupBy(col("doc_id"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    cand.crossJoin(broadcast(stats.crossJoin(dfRow)))
      .select(col("doc_id"), bm25ScoreSum(n).as("_score"))
      .filter(col("_score") > 0.0)
      .orderBy(col("_score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("_score"), 6).as("score_r6"))
  }

  /** Top-k characteristic terms per document by TF-IDF — the
    * keyword-extraction pass (doc tags, index pruning, topic drift
    * monitoring) over the same tokenization every text query shares:
    *   score = tf · ln(N / df),  rounded to 6 decimals BEFORE ranking
    * so both engines rank the identical rounded values (the
    * perplexity/k-means float convention; ties inside a doc break by
    * term — a total order).
    *
    * Plan shape: tf = one (doc, term) aggregation; df = one term
    * aggregation OVER THE TF TABLE (vocabulary-sized input, not the
    * token stream twice); N = one broadcast scalar; the per-doc top-k
    * runs on [[graft.plans.TopKPerGroup]]'s heap — one clustered
    * exchange, k rows of state per doc, NO per-group sort of
    * vocabulary-sized posting lists. Nothing here is corpus-quadratic
    * and the exchanges line up on their aggregation keys. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tfT = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tfT.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("_nd"))
    val scored = tfT.join(dfT, "term")
      .crossJoin(broadcast(nDocs)) // 1-row corpus scalar
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf").cast("double") *
          log(col("_nd").cast("double") / col("df").cast("double")), 6)
          .as("score6"))
    graft.plans.TopKPerGroup.topKSorted(scored, Seq("doc_id"),
        Seq("score6" -> false, "term" -> true), k, "rank")
      .select(col("doc_id"), col("rank"), col("term"), col("score6"))
  }

  /** Class-based TF-IDF (Grootendorst 2022's c-TF-IDF, the BERTopic
    * topic-description kernel): treat each CLASS as one concatenated
    * document and score term t in class c by
    *   tf(t, c) · ln(1 + A / f(t)),
    * A = average token count per class, f(t) = corpus frequency of t
    * — the "which words characterize this source/cluster" pass a
    * curation pipeline runs per domain or per dedup cluster. All
    * counts are exact integers; A/f and the ln are the only doubles,
    * and scores round to 6 BEFORE ranking (the round-before-rank
    * convention; ties break on the term).
    *
    * Plan shape: one (class, term) aggregation over the token stream
    * (map-side combined), a vocabulary-sized marginal read off that
    * table, two broadcast 1-row scalars, and the per-class top-k on
    * the TopKPerGroup heap. Nothing corpus-quadratic. */
  def cTfIdfTopTerms(docs: DataFrame, classCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = docs
      .select(col(classCol).as("class"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("class"), col("term")).agg(count(lit(1)).as("tf"))
    val ft = tf.groupBy(col("term")).agg(sum(col("tf")).as("ft"))
    val avgA = tf.agg((sum(col("tf")).cast("double") /
      countDistinct(col("class")).cast("double")).as("_a"))
    val scored = tf.join(ft, "term")
      .crossJoin(broadcast(avgA)) // 1-row corpus scalar
      .select(col("class"), col("term"), col("tf"),
        round(col("tf").cast("double") *
          log(lit(1.0) + col("_a") / col("ft").cast("double")), 6)
          .as("score6"))
    graft.plans.TopKPerGroup.topKSorted(scored, Seq("class"),
        Seq("score6" -> false, "term" -> true), k, "rank")
      .select(col("class"), col("rank"), col("term"), col("tf"),
        col("score6"))
  }

  /** Pointwise-mutual-information collocations (Church & Hanks 1990):
    * the corpus's top-k most-associated adjacent word pairs,
    *   pmi = ln( N · c(w1,w2) / (c(w1,·) · c(·,w2)) ),
    * with the marginals taken over BIGRAM SLOTS (c(w1,·) = bigrams
    * whose left word is w1) so the three counts live in one
    * self-consistent probability space — no end-of-document
    * correction terms. `minCount` floors c(w1,w2) (PMI's known bias
    * toward hapax pairs); scores round to 6 decimals BEFORE ranking
    * (both engines rank identical numbers, ties break (w1, w2) asc)
    * — the repo's round-before-rank convention.
    *
    * Plan shape: one (w1,w2) count (map-side combined), two
    * VOCABULARY-sized marginal aggregations read off that bigram
    * table (not the token stream twice), one broadcast 1-row N, and a
    * global top-k that plans as TakeOrderedAndProject — k rows per
    * partition cross to the driver-side heap, never a full sort.
    * Nothing is corpus-quadratic; the exchanges are the aggregation
    * keys. */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    val words = split(col(textCol), " ")
    val pairs = docs
      .where(size(words) >= 2)
      .select(explode(zip_with(
        slice(words, lit(1), size(words) - 1),
        slice(words, lit(2), size(words) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cab = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    val left = cab.groupBy("w1").agg(sum(col("cab")).as("c1"))
    val right = cab.groupBy("w2").agg(sum(col("cab")).as("c2"))
    val n = cab.agg(sum(col("cab")).as("_n"))
    cab.where(col("cab") >= minCount)
      .join(left, "w1")
      .join(right, "w2")
      .crossJoin(broadcast(n)) // 1-row corpus scalar
      .select(col("w1"), col("w2"), col("cab"),
        round(log(col("_n").cast("double") * col("cab").cast("double")
          / (col("c1").cast("double") * col("c2").cast("double"))), 6)
          .as("pmi6"))
      .orderBy(col("pmi6").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09) —
    * the standard hybrid-retrieval combiner: given N ranked legs
    * (e.g. lexical BM25 and dense cosine), each document scores
    * Σ over legs of 1/(k0 + rank_leg(d)), with absent legs
    * contributing 0, and the fused list is the top `topK` by that
    * score. RRF needs only ranks — never the legs' incomparable raw
    * scores — which is what makes it robust across scoring scales.
    *
    * Determinism: contributions are summed left-to-right in the
    * given leg order as one fixed expression tree, so the double
    * summation order is engine-identical; ties on the exact fused
    * score break by id ascending; the emitted score is rounded to 6
    * decimals (+0.0 to normalize −0.0).
    *
    * Shape at 100 TB: each leg is already a top-k ranked list — a
    * k-row relation — so the legs UNION (tagged by leg index) and
    * pivot back to per-leg rank columns in ONE hash aggregate keyed
    * on the id: linear plan growth in the leg count (the r17 review
    * noted the previous full-outer-join chain grew quadratic-ish past
    * a few legs), and each pivot cell aggregates at most one row (a
    * leg ranks an id once), so the per-leg ranks — and therefore the
    * fused expression tree — are exactly the join formulation's. All
    * the scan cost lives in producing the legs.
    *
    * PRECONDITION (load-bearing for the pivot): each leg is a ranked
    * top-k LIST — at most one row per id, ids non-null (a duplicated
    * id would collapse to its max rank; null ids would merge across
    * legs). Both [[graft.plans.TopKPerGroup]] and a row_number leg
    * satisfy it by construction.
    *
    * @return (idCol, rrf_r6, rank_0 … rank_{N−1}) with per-leg ranks
    *   coalesced to 0 for ids the leg did not return. */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int, topK: Int): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    val tagged = legs.zipWithIndex
      .map { case (l, i) =>
        l.select(col(idCol), lit(i).as("_leg"),
          col(rankCol).cast("long").as("_rank")) }
      .reduceLeft(_ unionByName _)
    def legRank(i: Int) =
      max(when(col("_leg") === i, col("_rank"))).as(s"rank_$i")
    val joined = tagged.groupBy(col(idCol))
      .agg(legRank(0), legs.indices.tail.map(legRank): _*)
    val fused = legs.indices
      .map(i => coalesce(
        lit(1.0) / (lit(k0.toDouble) + col(s"rank_$i").cast("double")),
        lit(0.0)))
      .reduceLeft(_ + _)
    joined
      .select(col(idCol) +: fused.as("_rrf") +:
        legs.indices.map(i =>
          coalesce(col(s"rank_$i"), lit(0L)).as(s"rank_$i")): _*)
      .orderBy(col("_rrf").desc, col(idCol))
      .limit(topK)
      .select(col(idCol) +: (round(col("_rrf"), 6) + lit(0.0)).as("rrf_r6") +:
        legs.indices.map(i => col(s"rank_$i")): _*)
  }
}
