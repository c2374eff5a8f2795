package graft.operators

import graft.SparkSpec
import graft.functions.NativeText
import org.apache.spark.sql.functions._

/** r21 optimization-refactor parity: the operators that grew
  * "FromRanked"/"FromTriangles" entry points (so several gates can
  * share one staged build of the threshold-independent prefix) must
  * return EXACTLY what the self-contained forms return — the staging
  * seam may move work, never results. */
class SharedPrefixParitySpec extends SparkSpec {

  private def docsDf = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),      // near-dup of 1
      (3L, "z y x w v u t s r q"),
      (4L, "a b c d e"),                // contained in 1's prefix
      (5L, "m n o p q r s t u v w x"),
      (6L, "a b c d e f g h i j"),      // exact dup of 1
    ).toDF("doc_id", "text")
  }

  private def shingles =
    docsDf.select(col("doc_id"),
      explode(NativeText.shingleHashes(split(col("text"), " "), 3)).as("h"))

  test("jaccardSelfJoinFromShingles with a precomputed rankedShingles " +
      "equals the self-contained form") {
    val sh = shingles
    val ranked = TextDedup.rankedShingles(sh, "doc_id")
    val a = TextDedup.jaccardSelfJoinFromShingles(sh, "doc_id", 0.4)
      .orderBy("d1", "d2").collect().toSeq
    val b = TextDedup.jaccardSelfJoinFromShingles(sh, "doc_id", 0.4,
        ranked = Some(ranked))
      .orderBy("d1", "d2").collect().toSeq
    assert(a.nonEmpty, "fixture must produce pairs")
    assert(a === b)
  }

  test("containmentSelfJoinFromShingles with a precomputed " +
      "rankedShingles equals the self-contained form") {
    val sh = shingles
    val ranked = TextDedup.rankedShingles(sh, "doc_id")
    val a = TextDedup.containmentSelfJoinFromShingles(sh, "doc_id", 0.6)
      .orderBy("d1", "d2").collect().toSeq
    val b = TextDedup.containmentSelfJoinFromShingles(sh, "doc_id", 0.6,
        ranked = Some(ranked))
      .orderBy("d1", "d2").collect().toSeq
    assert(a.nonEmpty, "fixture must produce pairs")
    assert(a === b)
  }

  test("KN FromJoined forms over a precomputed joined relation equal " +
      "the self-contained forms (both orders)") {
    val docs = docsDf.select(col("doc_id"),
      split(col("text"), " ").as("w"))
    // order 2
    val c2 = Corpus.knCounts(docs, "doc_id", "w")
    val j2 = Corpus.knJoinedRelation(c2)
    assert(Corpus.knModel(c2).orderBy("w1", "w2").collect().toSeq ===
      Corpus.knModelFromJoined(j2).orderBy("w1", "w2").collect().toSeq)
    assert(Corpus.knScoreFromCounts(docs, "doc_id", "w", c2)
        .orderBy("doc_id").collect().toSeq ===
      Corpus.knScoreFromJoined(docs, "doc_id", "w", j2)
        .orderBy("doc_id").collect().toSeq)
    // order 3
    val c3 = Corpus.kn3Counts(docs, "doc_id", "w")
    val j3 = Corpus.kn3JoinedRelation(c3)
    val m3 = Corpus.kn3Model(c3).orderBy("w1", "w2", "w3").collect().toSeq
    assert(m3.nonEmpty, "fixture must produce trigram types")
    assert(m3 ===
      Corpus.kn3ModelFromJoined(j3).orderBy("w1", "w2", "w3")
        .collect().toSeq)
    assert(Corpus.kn3ScoreFromCounts(docs, "doc_id", "w", c3)
        .orderBy("doc_id").collect().toSeq ===
      Corpus.kn3ScoreFromJoined(docs, "doc_id", "w", j3)
        .orderBy("doc_id").collect().toSeq)
    assert(Corpus.kn3PruneGains(c3).orderBy("w1", "w2", "w3")
        .collect().toSeq ===
      Corpus.kn3PruneGainsFromJoined(j3).orderBy("w1", "w2", "w3")
        .collect().toSeq)
  }

  test("clusteringCoefficientsFromTriangles over precomputed " +
      "triangleCounts equals clusteringCoefficients") {
    val s = spark
    import s.implicits._
    // two triangles sharing an edge + a pendant node
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("src", "dst")
    val a = Graph.clusteringCoefficients(edges, "src", "dst")
      .orderBy("id").collect().toSeq
    val tri = Graph.triangleCounts(edges, "src", "dst")
    val b = Graph.clusteringCoefficientsFromTriangles(tri, edges,
        "src", "dst")
      .orderBy("id").collect().toSeq
    assert(a.exists(_.getLong(2) > 0), "fixture must contain triangles")
    assert(a === b)
  }
}
