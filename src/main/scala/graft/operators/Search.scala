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
    // fixed left-to-right addition: deterministic double summation order
    val score = (0 until n).map(termScore).reduceLeft(_ + _)

    staged.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("_score"))
      .filter(col("_score") > 0.0)
      .orderBy(col("_score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("_score"), 6).as("score_r6"))
  }
}
