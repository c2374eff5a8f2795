package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distinct-count sketching — the cardinality-estimation
  * pass a 100 TB dedup plan runs FIRST (how many distinct shingles /
  * urls / doc hashes per source?) before committing to the exact
  * operators' shuffles.
  *
  * The sketch is KMV (k minimum values, the bottom-k / Theta-sketch
  * family): per group, keep the k smallest DISTINCT 60-bit hashes of
  * the value; if fewer than k exist the count is exact, otherwise the
  * k-th smallest hash h_k estimates the cardinality as
  * (k-1) * 2^60 / h_k (the classic KMV estimator — relative error
  * ~1/sqrt(k-2)). Unlike HLL (whose register layout is
  * engine-private), every step here — md5-derived hash, k-th order
  * statistic, one double division, floor — is replayable bit-for-bit
  * by any SQL engine, so the estimate itself is oracle-checkable, and
  * the sketch is MERGEABLE: the union's bottom-k is the bottom-k of
  * the concatenated sketches, which is what lets per-partition /
  * per-day sketches roll up without rescanning data.
  *
  * Scale shape: the heavy lifting is one (group, hash) dedup shuffle
  * + the [[graft.plans.TopKPerGroup]] heap (O(groups * k) memory, no
  * full sort), so the sketch costs one pass regardless of corpus
  * size. Reference analogue: the ES `cardinality` aggregation the
  * stats API exposes (idb/stats/collect.py) — same job, but exact-
  * replayable instead of engine-opaque.
  */
object Sketches {

  /** hash60's range: hashes are uniform in [0, 2^60). */
  val HashSpace: Double = (1L << 60).toDouble

  /** KMV sketch per group: one row per group with `kmv` = the k
    * smallest distinct values of `hashCol`, sorted ascending. The
    * input's `hashCol` must already be hash60-uniform (see
    * [[TextDedup.hash60]] / NativeText.shingleHashes).
    *
    * Executes on [[graft.functions.KmvAgg]], a k-bounded
    * TypedImperativeAggregate: each task folds its partition into ≤ k
    * distinct minima and only those cross the wire — the old
    * distinct-then-heap formulation's Exchange carried ONE ROW PER
    * DISTINCT HASH, i.e. the very cardinality the sketch exists to
    * avoid materializing (at sf0.1 that shuffle made q_distinct_kmv
    * the slowest query on the board). Same deterministic bottom-k
    * array under any partitioning; [[kmvViaDistinct]] is retained as
    * the executable specification, spec-pinned row-equal. */
  def kmv(df: DataFrame, groupCols: Seq[String], hashCol: String,
      k: Int): DataFrame =
    df.select(groupCols.map(col) :+ col(hashCol).as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KmvSketch.kmvSketch(col("_h"), k).as("kmv"))

  /** The distinct + bounded-heap formulation [[kmv]] replaced — kept
    * as its executable specification (the kernel-parity pattern). */
  def kmvViaDistinct(df: DataFrame, groupCols: Seq[String], hashCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val dedup = df
      .select(groupCols.map(col) :+ col(hashCol).as("_h"): _*)
      .distinct()
    graft.plans.TopKPerGroup.topK(dedup, groupCols, Seq("_h"), k, "_r")
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("_h"))).as("kmv"))
  }

  /** Merge two sketch arrays (union semantics): bottom-k of the
    * distinct union. Associative + commutative, so partial sketches
    * roll up in any tree shape. */
  def merge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** The estimator over a sketch array: exact size when the group had
    * fewer than k distinct values, else floor((k-1) * 2^60 / h_k).
    * All-double arithmetic in evaluation order (k-1)*2^60 first (both
    * factors exact in double for any sane k) then one IEEE division —
    * an oracle replays it as
    * `CAST(FLOOR((k-1) * 2^60 / CAST(h_k AS DOUBLE)) AS BIGINT)`. */
  def estimate(kmvCol: Column, k: Int): Column =
    when(size(kmvCol) < k, size(kmvCol).cast("long"))
      .otherwise(floor(
        lit((k - 1).toDouble * HashSpace) /
          element_at(kmvCol, k).cast("double")).cast("long"))

  /** HLL register sketch per group ([[graft.functions.HllAgg]]):
    * one row per group with `hll` = the m-register array. Input rows
    * need NOT be distinct — duplicate updates are absorbed by the
    * register max, which is the whole point: unlike [[kmv]] (whose
    * update path still had to see each hash to keep the bottom-k
    * distinct), HLL never materializes per-distinct state anywhere —
    * the buffer is m bytes per (task, group), m bytes cross the wire,
    * and merge is an element-wise max. KMV remains the higher-accuracy
    * choice at equal oracle-replayability; HLL is the constant-memory
    * one (256 bytes vs 2 KB at k=256) and the one whose merge is
    * idempotent (re-merging a shard twice cannot skew it). */
  def hll(df: DataFrame, groupCols: Seq[String], hashCol: String,
      m: Int = 256): DataFrame =
    df.select(groupCols.map(col) :+ col(hashCol).as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.HyperLogLog.hllSketch(col("_h"), m).as("hll"))

  /** The raw HLL estimator constant alpha_m * m^2 * 2^(wBits+1), where
    * wBits = 60 - log2(m): the estimate is this double divided by the
    * INTEGER register sum Z_int = sum_j 2^(wBits+1-M_j). Scaling Z by
    * 2^(wBits+1) makes it an exact BIGINT (each term a power of two
    * <= 2^53, at most m terms — order-independent integer addition),
    * so the only floating-point steps are this constant (embed its
    * `toString` in oracle SQL — shortest-round-trip repr parses to the
    * same bits) and ONE IEEE division. */
  def hllConstant(m: Int): Double = {
    val wBits = 60 - java.lang.Integer.numberOfTrailingZeros(m)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, wBits + 1)
  }

  /** The raw HLL estimate off a register array: floor(C / Z_int).
    * Raw-only by design — the classic small-range linear-counting
    * branch needs ln(), whose cross-engine determinism is weaker than
    * one division; below ~2.5m distinct values prefer [[kmv]], which
    * is EXACT there. The register fold is a groups-sized interpreted
    * HOF over m elements — never on a per-row path. */
  def hllEstimate(regs: Column, m: Int): Column = {
    val wBits = 60 - java.lang.Integer.numberOfTrailingZeros(m)
    val zInt = aggregate(regs, lit(0L),
      (acc, r) => acc + floor(pow(lit(2.0), lit(wBits + 1) - r)).cast("long"))
    floor(lit(hllConstant(m)) / zInt.cast("double")).cast("long")
  }

  /** Pairwise distinct-set OVERLAP estimation between groups off their
    * KMV sketches (the Theta-sketch set-operation family, Dasgupta et
    * al.): for every group pair (a < b), merge the two bottom-k
    * sketches, count the merged sketch's hashes present in BOTH — an
    * unbiased sample of the union weighted toward the intersection —
    * and emit
    *   `common`    (matches within the merged bottom-k),
    *   `est_union` (the KMV estimator over the merged sketch),
    *   `est_inter` = floor(common * est_union / |merged|), where
    *   |merged| = min(k, |union|) is the merged sample's actual size —
    *   k once the sketches are full, the exact union count below it
    *   (where `common` is already the exact intersection, so the
    *   ratio collapses to `common` itself).
    * "How much does source A overlap source B" for every pair of a
    * 100 TB corpus's domains at the cost of ONE sketch pass plus a
    * groups-sized pair join: the quadratic term is G² k-arrays (G =
    * #groups — a dimension table), never data. All arithmetic is
    * integer except one exact product (common·est_union < 2^53) and
    * one IEEE double division — deterministic, so the estimates replay
    * bit-for-bit in SQL. */
  def kmvOverlap(df: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val sk = kmv(df, Seq(groupCol), hashCol, k)
    val a = sk.select(col(groupCol).as("source_a"), col("kmv").as("_ka"))
    val b = sk.select(col(groupCol).as("source_b"), col("kmv").as("_kb"))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("_mg", merge(col("_ka"), col("_kb"), k))
      .withColumn("common", size(array_intersect(
        array_intersect(col("_mg"), col("_ka")), col("_kb"))).cast("long"))
      .withColumn("est_union", estimate(col("_mg"), k))
      .select(col("source_a"), col("source_b"), col("common"),
        col("est_union"),
        floor(col("common").cast("double") * col("est_union").cast("double")
          / size(col("_mg")).cast("double")).cast("long").as("est_inter"))
  }

  /** Quantile sketch by bottom-k uniform sampling — the third leg of
    * the mergeable-summary family (KMV = distinct count, Misra-Gries =
    * heavy hitters, this = quantiles): per group, keep the k rows
    * whose content hash ([[TextDedup.hash60]] of the id) is smallest —
    * a uniform random sample that is DETERMINISTIC in the data (no
    * rand(), no partition order), then read type-1 sample quantiles
    * off the sorted sample: value at index floor((n-1)·q) (0-based).
    *
    * Mergeable like KMV: the union's bottom-k by hash is the bottom-k
    * of the concatenated per-part samples (SketchSpec pins the
    * property), so per-shard / per-day samples roll up in any tree
    * without rescanning. Expected rank error of a k-sample quantile is
    * ~sqrt(q(1-q)/k); k=64 puts p50 within ±6 rank points with high
    * probability — the "is this column's p99 about X?" pass a 100 TB
    * pipeline runs before sizing partitions or caps. Every step (md5
    * hash order, k-th order statistics, floor index) replays
    * bit-for-bit in SQL, so unlike t-digest/GK the ESTIMATE itself is
    * oracle-checkable.
    *
    * Scale shape: one [[graft.plans.TopKPerGroup]] heap pass (single
    * hash-partition shuffle, O(groups·k) memory, no full sort), then a
    * groups-sized aggregation of k-length arrays. Output: group,
    * `n_sample`, one long column per requested quantile. */
  def quantileSketch(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int, qs: Seq[(String, Double)]): DataFrame = {
    val hashed = df.select(col(groupCol), col(valueCol),
      TextDedup.hash60(col(idCol).cast("string")).as("_h"),
      col(idCol).as("_id"))
    val sampled = graft.plans.TopKPerGroup.topK(
      hashed, Seq(groupCol), Seq("_h", "_id"), k, "_r")
    sampled.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col(valueCol))).as("_vals"),
        count(lit(1)).as("n_sample"))
      .select(col(groupCol) +: col("n_sample") +: qs.map { case (name, q) =>
        element_at(col("_vals"),
          (floor((col("n_sample") - 1) * q) + 1).cast("int"))
          .cast("long").as(name)
      }: _*)
  }

  /** The depth bucket indexes of a key for [[countMinSketch]] —
    * hash60(key || ':cm<i>') mod width, computed by codegen'd md5
    * Column arithmetic so sketch build and probe (and the SQL oracle)
    * share one definition. */
  def cmBuckets(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      pmod(TextDedup.hash60(concat(key, lit(s":cm$i"))),
        lit(width.toLong)).cast("int")): _*)

  /** Global Count-Min frequency sketch over a key column: ONE row out
    * (the depth×width counter matrix, row-major array<long>), built by
    * [[graft.functions.CountMinAgg]] — partial matrices merge
    * element-wise map-side, so the key domain never reaches the
    * exchange; the shuffle carries depth·width longs per task, full
    * stop. The pass a 100 TB pipeline runs when it needs after-the-fact
    * point frequencies for arbitrary keys (not just retained
    * candidates — that's [[heavyHitters]]' trade) at bounded memory. */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame =
    df.agg(graft.functions.CountMin.countMin(
      cmBuckets(col(keyCol), depth, width), depth, width).as("cm"))

  /** Point-frequency estimates for a probe-key relation off a built
    * sketch: MIN over the key's depth counters — never under the true
    * count, over by at most eps·N w.h.p. The sketch is a 1-row scalar
    * (broadcast crossJoin, the repo's corpus-scalar idiom); probes
    * stream through one scan. Integer arithmetic end to end. */
  def countMinQuery(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val withB = probes
      .crossJoin(broadcast(sketch)) // 1-row sketch scalar
      .withColumn("_b", cmBuckets(col(keyCol), depth, width))
    val ests = (0 until depth).map(i =>
      element_at(col("cm"),
        element_at(col("_b"), i + 1) + lit(i * width) + lit(1)))
    val est = if (depth == 1) ests.head else least(ests: _*)
    withB.select(col(keyCol), est.as("cnt_est"))
  }

  /** Exact global top-k over an unbounded key domain via a
    * Misra-Gries candidate pass — the heavy-hitters shape for 100 TB:
    *
    *  1. CANDIDATES: one scan folds each partition into a bounded
    *     ≤`capacity`-entry counter summary
    *     ([[graft.functions.MisraGriesAgg]], a custom
    *     TypedImperativeAggregate); only summaries cross the wire —
    *     the full key domain is NEVER shuffled, unlike a groupBy
    *     whose exchange carries one row per distinct key.
    *  2. EXACT RECOUNT: the candidate keys (≤ capacity — broadcast)
    *     semi-filter a second scan; only candidate rows reach the
    *     count exchange; top-k by (cnt desc, key) plans as
    *     TakeOrderedAndProject.
    *
    * The two-pass shape is what makes the answer EXACT and
    * partition-layout-independent (and therefore oracle-checkable):
    * MG guarantees every key with true count > n/(capacity+1) survives
    * pass 1 no matter how rows were split, so with capacity sized
    * above the top-k frequency floor the recounted top-k is the true
    * top-k. Size `capacity` ≫ k·skew⁻¹; a capacity at or above the
    * distinct-key count degenerates to exact counting with zero
    * decrements (the regime the driver gate runs in at test scale —
    * the spec exercises the lossy regime adversarially). */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      capacity: Int): DataFrame = {
    val cand = df
      .agg(graft.functions.MisraGries.misraGries(col(keyCol), capacity).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key").as(keyCol))
    df.join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol)).limit(k)
  }
}
