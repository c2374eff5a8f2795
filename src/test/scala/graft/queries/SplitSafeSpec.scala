package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The leakage-safety contract of q_split_safe: no near-dup pair —
  * and by transitivity no near-dup CLUSTER — ever straddles a split
  * boundary, while unclustered documents keep the plain content-hash
  * assignment (q_split_hash's). */
class SplitSafeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every gated near-dup pair lands in one split; unclustered " +
      "docs keep the plain hash-split assignment") {
    val splits = LlmQueries.qSplitSafe(spark, sfDir)
      .select(col("doc_id"), col("rep"), col("split"))
    val pairs = LlmQueries.qDedupMinhash(spark, sfDir)
      .select(col("d1"), col("d2"))
    assert(pairs.count() > 0, "fixture must provide near-dup pairs")
    val straddling = pairs
      .join(splits.select(col("doc_id").as("d1"), col("split").as("s1")), "d1")
      .join(splits.select(col("doc_id").as("d2"), col("split").as("s2")), "d2")
      .where(col("s1") =!= col("s2"))
    assert(straddling.count() === 0L)

    // unclustered docs (rep == own id) match q_split_hash exactly
    val plain = LlmQueries.qSplitHash(spark, sfDir)
      .select(col("doc_id"), col("split").as("plain_split"))
    val diverging = splits.where(col("rep") === col("doc_id"))
      .join(plain, "doc_id")
      .where(col("split") =!= col("plain_split"))
    assert(diverging.count() === 0L)

    // and at least one CLUSTERED doc diverges from its plain
    // assignment somewhere in the fixture OR every cluster's members
    // already hash-agree — assert the join is non-vacuous instead of
    // flaky: every clustered member's split equals its rep's split
    val repSplit = splits.select(col("doc_id").as("rep"),
      col("split").as("rep_split"))
    val broken = splits.where(col("rep") =!= col("doc_id"))
      .join(repSplit, "rep")
      .where(col("split") =!= col("rep_split"))
    assert(broken.count() === 0L)
  }
}
