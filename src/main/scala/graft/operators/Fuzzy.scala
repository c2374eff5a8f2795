package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join — the name-matching primitive behind
  * the reference's scientific-name / collector-name reconciliation
  * problem space, built Ed-Join style (Xiao et al., VLDB'08):
  *
  *  1. tokenize each string into positional q-gram MULTISET keys
  *     (gram + occurrence number, so repeated grams count separately);
  *  2. rank each string's grams by GLOBAL corpus frequency (rarest
  *     first) and keep only the first `maxDist·q + 1` as its prefix —
  *     count filtering guarantees two strings within edit distance d
  *     share at least max(L₁,L₂) − q + 1 − d·q grams, so their
  *     prefixes must intersect (any pair the prefix join misses is
  *     provably beyond d);
  *  3. candidate pairs = equi-join on prefix gram keys (+ length-diff
  *     ≤ d prefilter), verified with the codegen `levenshtein`.
  *
  * Scale shape: the gram-frequency table is vocabulary-sized; the
  * candidate join keys on RARE grams by construction, so hot common
  * substrings (shared prefixes like "Supplier#00000") never become
  * join keys — exactly the failure mode a naive shared-any-gram join
  * has. Verification cost is |candidates|, not n². Recall is 1 by the
  * filter theory; the q_fuzzy_join oracle (brute-force n² levenshtein
  * in DuckDB) hash-checks exactly that.
  */
object Fuzzy {

  /** Fuzzy self-join: all pairs (id_1, id_2, dist) with id_1 < id_2 and
    * levenshtein(str_1, str_2) ≤ `maxDist`. */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist >= 1")
    val strs = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
      .withColumn("_len", length(col("_s")))
    // positional multiset grams: q-char substring windows, occurrence-
    // numbered so "aa" in "aaa" yields aa#1 and aa#2 (multiset, not set)
    val exploded = strs.select(col("_id"), col("_len"),
      posexplode(expr(
        s"transform(sequence(1, greatest(_len - ${q - 1}, 1)), " +
          s"i -> substr(_s, i, $q))")).as(Seq("_pos", "_g")))
    val occ = exploded.withColumn("_occ",
        row_number().over(Window.partitionBy(col("_id"), col("_g"))
          .orderBy(col("_pos"))))
      .withColumn("_key", concat(col("_g"), lit("#"), col("_occ")))
    // global rarity order; ties broken by the key for determinism
    val freq = occ.groupBy(col("_key")).agg(count(lit(1)).as("_n"))
    val prefixSize = maxDist * q + 1
    val prefixes = occ.join(freq, "_key")
      .withColumn("_rk", row_number().over(Window.partitionBy(col("_id"))
        .orderBy(col("_n"), col("_key"))))
      .filter(col("_rk") <= prefixSize)
      .select(col("_id"), col("_key"))
    val gramCand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a._key") === col("b._key") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_1"), col("b._id").as("id_2"))
    // Soundness floor: count filtering only bites when L − q + 1 > d·q,
    // i.e. L ≥ (d+1)·q — shorter strings can be within d while sharing
    // ZERO grams ("aaaa"/"abab" at d=2). Those pair exhaustively inside
    // a bounded length band (short side < (d+1)·q, partner ≤ that + d);
    // strings this short are a corpus rarity, so the band is a
    // correctness guard, not a cost center.
    val shortMax = (maxDist + 1) * q - 1
    val shortish = strs.filter(col("_len") <= shortMax + maxDist)
    val shortCand = shortish.as("a")
      .join(shortish.as("b"), col("a._id") < col("b._id") &&
        (least(col("a._len"), col("b._len")) <= shortMax))
      .select(col("a._id").as("id_1"), col("b._id").as("id_2"))
    val cand = gramCand.unionByName(shortCand).distinct()
    cand
      .join(strs.select(col("_id").as("id_1"), col("_s").as("_s1"),
        col("_len").as("_l1")), "id_1")
      .join(strs.select(col("_id").as("id_2"), col("_s").as("_s2"),
        col("_len").as("_l2")), "id_2")
      .filter(abs(col("_l1") - col("_l2")) <= maxDist)
      .withColumn("dist", levenshtein(col("_s1"), col("_s2")))
      .filter(col("dist") <= maxDist)
      .select(col("id_1"), col("id_2"), col("dist"))
  }

  /** Record-linkage pipeline: sorted-neighborhood BLOCKING + Jaro-
    * Winkler VERIFICATION (Winkler's census-matching recipe — block on
    * a cheap sort key, score only the neighbors): records are globally
    * ordered by the name's first `keyLen` chars (ties by id), each
    * record pairs with exactly its next `window` neighbors, and pairs
    * scoring ≥ `threshold` under the codegen'd
    * [[graft.functions.StringSim.jaroWinkler]] kernel survive.
    *
    * Cost shape: candidate count is EXACTLY n·window by construction
    * (never n²) and the JW kernel runs inside WholeStageCodegen over
    * the joined pairs — the global rank reuses
    * [[TextDedup.sortedNeighborPairs]]'s two-level form (sampled
    * quantile range-buckets over the (key, id) sort tuple via
    * [[TextDedup.rangeBucketExpr]], row_number within buckets,
    * broadcast cumulative bases), so no unpartitioned window ever
    * sees the record table and a skewed key prefix cannot collapse
    * the rank into one partition's sort (boundaries split mid-tie on
    * the id). Output: (rec_a, rec_b, jw6), jw rounded
    * to 6 before the threshold on BOTH engines (the oracle replays
    * with DuckDB's native jaro_winkler_similarity — byte-exact per
    * the kernel's UTF-8 contract).
    *
    * `sortKey` chooses the blocking key expression (default: the name
    * itself). SNM only finds matches whose corruption leaves the
    * first `keyLen` key chars intact, so pick a key that puts the
    * STABLE, high-entropy part of the name first — e.g.
    * `reverse(name)` for id-suffixed names like "Customer#000000042",
    * the classic multi-pass-SNM key trick (a uniform prefix otherwise
    * makes the whole table one tie block and recall collapses). */
  def snmLinkage(recs: DataFrame, idCol: String, nameCol: String,
      window: Int, threshold: Double,
      keyLen: Int = 16, numBuckets: Int = 32,
      sortKey: Option[org.apache.spark.sql.Column] = None,
      stageKey: Option[String] = None): DataFrame = {
    val keySrc = sortKey.getOrElse(col(nameCol))
    val slim = recs.select(substring(keySrc, 1, keyLen).as("_k"),
      col(idCol).as("_id"))
    val keyed = recs.select(col(idCol).as("_id"),
      col(nameCol).as("_nm"),
      substring(keySrc, 1, keyLen).as("_k"))
      .withColumn("_b", TextDedup.rangeBucketExpr(slim, numBuckets, stageKey))
    val wLocal = Window.partitionBy(col("_b"))
      .orderBy(col("_k"), col("_id"))
    val wBase = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = keyed.groupBy(col("_b")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_base", sum(col("_cnt")).over(wBase) - col("_cnt"))
      .select(col("_b"), col("_base"))
    val ranked = keyed
      .withColumn("_lr", row_number().over(wLocal))
      .join(broadcast(bases), Seq("_b"))
      .select((col("_base") + col("_lr")).as("_rn"), col("_id"),
        col("_nm"))
    val right = ranked.select(col("_rn").as("_rnb"),
      col("_id").as("_idb"), col("_nm").as("_nmb"))
    val jw = graft.functions.StringSim.jaroWinkler(col("_nm"), col("_nmb"))
    ranked
      .withColumn("_d", explode(sequence(lit(1), lit(window))))
      .withColumn("_rnb", col("_rn") + col("_d"))
      .join(right, "_rnb")
      .withColumn("jw6", round(jw, 6))
      .where(col("jw6") >= threshold)
      .select(least(col("_id"), col("_idb")).as("rec_a"),
        greatest(col("_id"), col("_idb")).as("rec_b"), col("jw6"))
  }
}
