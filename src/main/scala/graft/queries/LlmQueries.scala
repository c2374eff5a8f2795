package graft.queries

import graft.Tables
import graft.hash.Etags
import graft.operators.{Corpus, Graph, Similarity, Sketches, TextDedup, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables, each with a DuckDB oracle.
  *
  * Oracle strategy per family:
  *  - exact dedup: both sides build the identical etag JSON + md5;
  *  - MinHash LSH: the oracle is ground truth (brute-force shingle
  *    Jaccard); the Spark side must *find* all pairs via banding + exact
  *    verification — at the data's J≈0.97 the 16×4 band miss probability
  *    is ~1e-15, so LSH recall is deterministic in practice;
  *  - SimHash: banding recall for hamming ≤ 3 is *exactly* 1 by
  *    pigeonhole, and the 60-bit word hash (md5 prefix) is reproduced in
  *    SQL, so both sides are exact;
  *  - ANN: ranks (not raw floats) are compared; dot products are
  *    sequential double folds on both engines.
  */
object LlmQueries {

  // --- exact dedup (hash-groupBy; db_check.py:271-297 etag dedup) ------

  /** Corpus with deterministic exact duplicates injected (every 10th doc
    * re-appears under a shifted id) — sf0.01 documents are all-distinct,
    * which would make the operator's output vacuously empty. */
  private def docsWithDups(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000))
  }

  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    docsWithDups(s, dir)
      .select(Etags.etagColumnMd5(
        map(lit("lang"), col("lang"), lit("text"), col("text"))).as("etag"))
      .groupBy(col("etag")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy(col("etag"))

  val qDedupExactSql: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 10 = 0),
      |e AS (SELECT md5('["lang","' || lang || '","text","' || text || '"]') AS etag
      |      FROM all_docs)
      |SELECT etag, COUNT(*) AS n FROM e GROUP BY etag
      |HAVING COUNT(*) > 1 ORDER BY etag""".stripMargin

  // --- MinHash + LSH near-dup ------------------------------------------

  /** The verified τ = 0.5 MinHash pair list, staged once per
    * (session, dir) ([[graft.Staging]]) — SEVEN gates consume it
    * (minhash, clusters, apply, keep_best, golden, sweep, datasheet);
    * at 100 TB it is THE stored near-dup pair table every downstream
    * dedup product reads. */
  private def dedupPairs05Staged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"dedup:pairs05:$dir") {
      TextDedup.minhashNearDups(Tables.documents(s, dir), "doc_id",
        "text", shingleSize = 3, threshold = 0.5)
    }

  /** The pair list's connected components (cluster labels), staged —
    * four gates consume them (clusters, apply, keep_best, golden). */
  private def dedupCc05Staged(s: SparkSession, dir: String): DataFrame = {
    // prerequisite stage resolved BEFORE entering (the Staging.stage
    // contract: no recursive computeIfAbsent)
    val pairs = dedupPairs05Staged(s, dir)
    graft.Staging.stage(s, s"dedup:cc05:$dir") {
      Graph.connectedComponents(pairs, "d1", "d2")
    }
  }

  def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    dedupPairs05Staged(s, dir)
      .orderBy(col("d1"), col("d2"))

  /** Shared CTE chain: brute-force shingle-Jaccard pair ground truth at
    * the given threshold (used by the minhash oracle directly, closed
    * over recursively by the cluster oracle, at a lower τ as the EXACT
    * expected output of the prefix-filtered Jaccard join, and — over a
    * non-`documents` relation — by the composed pipeline oracle). */
  private[queries] def jaccardPairsCte(tau: String,
      rel: String = "documents"): String =
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS w FROM $rel),
      |g AS (SELECT doc_id, unnest(range(len(w) - 2)) AS i, w FROM d),
      |sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS s FROM g),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (
      |  SELECT d1, d2,
      |    CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) AS jaccard
      |  FROM inter
      |  JOIN sizes s1 ON d1 = s1.doc_id
      |  JOIN sizes s2 ON d2 = s2.doc_id
      |  WHERE CAST(c AS DOUBLE) / CAST(s1.n + s2.n - c AS DOUBLE) >= $tau)""".stripMargin

  private val minhashPairsCte: String = jaccardPairsCte("0.5")

  val qDedupMinhashSql: String =
    s"""WITH $minhashPairsCte
       |SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2""".stripMargin

  /** INCREMENTAL dedup — a delta batch (every 5th doc) deduped against
    * the already-signed rest of the corpus: only the delta is shingled
    * and signed, the base contributes its precomputed signature table,
    * base×base pairs are never formed. The oracle is the SAME
    * brute-force ground truth as the batch gate restricted to pairs
    * touching the delta — so the gate proves the incremental path
    * finds exactly the pairs a full re-run would have found for this
    * batch (recall argument identical: data near-dups sit at J≈0.97
    * where the 16×4 band miss probability is ~1e-15). */
  def qDedupIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    // the "stored" base signature table (at scale: read, not computed)
    val baseSigs = base.select(col("doc_id"),
        graft.functions.NativeText.minhashSig(
          split(col("text"), " "), 3).as("sig"))
      .where(size(col("sig")) > 0)
    TextDedup.incrementalNearDups(base, baseSigs, delta,
        "doc_id", "text", shingleSize = 3, threshold = 0.5)
      .orderBy(col("d1"), col("d2"))
  }

  val qDedupIncrSql: String =
    s"""WITH $minhashPairsCte
       |SELECT d1, d2, jaccard FROM pairs
       |WHERE d1 % 5 = 0 OR d2 % 5 = 0
       |ORDER BY d1, d2""".stripMargin

  /** Dedup THRESHOLD SWEEP: near-dup pair count and docs-involved
    * count at τ ∈ {0.5, 0.7, 0.9} from ONE verified pair list (the
    * q_linkage_eval discipline applied to dedup): exact Jaccard is
    * computed once at the lowest τ, each sweep row re-thresholds it —
    * the dup-rate-vs-threshold curve a curation run reads before
    * committing to a τ. Counts are exact integers; a τ with zero
    * pairs yields no row on either engine. */
  def qDedupSweep(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupPairs05Staged(s, dir)
    val sel = pairs
      .select(col("d1"), col("d2"), col("jaccard"),
        explode(array(lit(0.5), lit(0.7), lit(0.9))).as("tau"))
      .where(col("jaccard") >= col("tau"))
    val np = sel.groupBy(col("tau")).agg(count(lit(1)).as("n_pairs"))
    val inv = sel
      .select(col("tau"), explode(array(col("d1"), col("d2"))).as("d"))
      .groupBy(col("tau")).agg(countDistinct(col("d")).as("n_docs"))
    np.join(inv, Seq("tau")).orderBy(col("tau"))
  }

  val qDedupSweepSql: String =
    s"""WITH ${jaccardPairsCte("0.5")},
       |taus AS (SELECT unnest([0.5::DOUBLE, 0.7::DOUBLE,
       |    0.9::DOUBLE]) AS tau),
       |sel AS (SELECT tau, d1, d2 FROM pairs, taus WHERE jaccard >= tau),
       |np AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM sel GROUP BY 1),
       |inv AS (SELECT tau, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
       |  FROM (SELECT tau, d1 AS d FROM sel
       |        UNION ALL SELECT tau, d2 FROM sel) GROUP BY 1)
       |SELECT np.tau, n_pairs, n_docs FROM np JOIN inv USING (tau)
       |ORDER BY tau""".stripMargin

  /** EXACT n-gram Jaccard near-dup (prefix-filtered AllPairs join,
    * TextDedup.jaccardSelfJoin) at τ = 0.4 — deliberately BELOW the LSH
    * operating point: at low thresholds the 16×4 band curve's recall
    * decays (miss prob (1-0.4⁴)¹⁶ ≈ 0.66), which is exactly where an
    * exact algorithm is the right tool. The oracle is the same
    * brute-force ground truth as the minhash gate, so the hash match
    * proves EXACTNESS (recall = precision = 1), not just recall at a
    * forgiving threshold. */
  /** The (doc_id, h) per-doc-distinct 3-shingle table over
    * `documents`, staged once per (session, dir) — the shared prefix
    * of the two EXACT set-similarity gates (Jaccard τ=0.4 and
    * containment τ=0.6, threshold-independent by construction): each
    * previously exploded the full corpus independently and re-shingled
    * its candidates. At 100 TB this is a stored shingle index. */
  private def dedupShingles3(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"dedup:shingles3:$dir") {
      Tables.documents(s, dir).select(col("doc_id"),
        explode(graft.functions.NativeText.shingleHashes(
          split(col("text"), " "), 3)).as("h"))
    }

  /** The rarest-first ranked posting relation over [[dedupShingles3]],
    * staged once per (session, dir) — the df aggregation + per-doc rank
    * window is THRESHOLD-INDEPENDENT and was rebuilt by both exact
    * set-similarity gates (Jaccard τ=0.4 and containment τ=0.6); at
    * 100 TB it is the stored posting index the prefix filters read. */
  private def dedupRanked3(s: SparkSession, dir: String): DataFrame = {
    val sh = dedupShingles3(s, dir)
    graft.Staging.stage(s, s"dedup:ranked3:$dir") {
      TextDedup.rankedShingles(sh, "doc_id")
    }
  }

  def qDedupJaccard(s: SparkSession, dir: String): DataFrame =
    TextDedup.jaccardSelfJoinFromShingles(
        dedupShingles3(s, dir), "doc_id", threshold = 0.4,
        ranked = Some(dedupRanked3(s, dir)))
      .orderBy(col("d1"), col("d2"))

  val qDedupJaccardSql: String =
    s"""WITH ${jaccardPairsCte("0.4")}
       |SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2""".stripMargin

  /** EXACT n-gram CONTAINMENT near-dup (TextDedup.containmentSelfJoin)
    * at τ = 0.6: flags subset-duplicates — a short doc embedded in a
    * 3×-longer one has J ≤ 1/3 (invisible to every Jaccard-family
    * gate) but containment ≈ 1. The oracle is brute-force ground
    * truth, so the hash match proves exactness of the
    * prefix(smaller) ⋈ full(larger) pruning. */
  def qDedupContain(s: SparkSession, dir: String): DataFrame =
    TextDedup.containmentSelfJoinFromShingles(
        dedupShingles3(s, dir), "doc_id", threshold = 0.6,
        ranked = Some(dedupRanked3(s, dir)))
      .orderBy(col("d1"), col("d2"))

  val qDedupContainSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(range(len(w) - 2)) AS i, w FROM d),
      |sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS s FROM g),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (
      |  SELECT d1, d2,
      |    CAST(c AS DOUBLE) / CAST(least(s1.n, s2.n) AS DOUBLE) AS containment
      |  FROM inter
      |  JOIN sizes s1 ON d1 = s1.doc_id
      |  JOIN sizes s2 ON d2 = s2.doc_id
      |  WHERE CAST(c AS DOUBLE) / CAST(least(s1.n, s2.n) AS DOUBLE) >= 0.6)
      |SELECT d1, d2, containment FROM pairs ORDER BY d1, d2""".stripMargin

  /** EXACT duplicated-PASSAGE detection (TextDedup.duplicatedSpans):
    * every 10-word window appearing in ≥ 2 distinct documents —
    * sub-document granularity the whole-doc dedups cannot see. The
    * oracle replays the window explode with DuckDB list slicing. */
  def qDedupPassages(s: SparkSession, dir: String): DataFrame =
    TextDedup.duplicatedSpans(Tables.documents(s, dir), "doc_id", "text", 10)
      .orderBy(col("span"))

  /** Winnowing fingerprint profile ([[Corpus.winnowFingerprints]] —
    * the MOSS rolling-hash selection, SIGMOD 2003): per document, the
    * count/extrema/mod-sum of its winnowed fingerprint set (bounded
    * emit; the fingerprint INDEX at scale is the (fp, doc) relation
    * itself). The oracle replays the k-word window hash60s, the
    * w-window running min, the full-window cut and the distinct-value
    * selection — the entire selection algorithm, hash-checked. */
  /** The winnowed (doc_id, fp) index, staged once per (session, dir)
    * — shared by the profile and match gates; at scale it IS the
    * stored fingerprint index. */
  private def winnowFpsStaged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"winnow:fps:$dir") {
      graft.operators.Corpus.winnowFingerprints(
        Tables.documents(s, dir), "doc_id", "text",
        shingleSize = 3, window = 5)
    }

  def qWinnow(s: SparkSession, dir: String): DataFrame =
    winnowFpsStaged(s, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        min(col("fp")).as("fp_min"),
        max(col("fp")).as("fp_max"),
        (sum(col("fp") % 1000000007L) % 1000000007L).as("fp_sum"))
      .orderBy(col("doc_id"))

  val qWinnowSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(range(len(w) - 2)) AS pos, w FROM d),
      |s AS (SELECT doc_id, pos,
      |        try_cast('0x'||substr(md5(
      |          w[pos+1]||' '||w[pos+2]||' '||w[pos+3]),1,15) AS BIGINT) AS h
      |      FROM g),
      |m AS (SELECT doc_id, pos,
      |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
      |        count(*) OVER (PARTITION BY doc_id) AS n FROM s),
      |f AS (SELECT DISTINCT doc_id, fp FROM m
      |      WHERE pos <= greatest(n - 5, 0))
      |SELECT doc_id, count(*) AS n_fp,
      |  min(fp) AS fp_min, max(fp) AS fp_max,
      |  CAST(sum(fp % 1000000007) % 1000000007 AS BIGINT) AS fp_sum
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Fingerprint-overlap pairs over the winnowed index
    * ([[Corpus.winnowMatches]]): docs sharing >= 2 rare winnowed
    * fingerprints — the near-copy detector the fingerprint index
    * exists for. The oracle replays selection + df-prune + self-join. */
  def qWinnowMatch(s: SparkSession, dir: String): DataFrame =
    graft.operators.Corpus.winnowMatches(
        winnowFpsStaged(s, dir),
        "doc_id", minShared = 2, maxDocFreq = 100)
      .orderBy(col("d1"), col("d2"))

  val qWinnowMatchSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(range(len(w) - 2)) AS pos, w FROM d),
      |s AS (SELECT doc_id, pos,
      |        try_cast('0x'||substr(md5(
      |          w[pos+1]||' '||w[pos+2]||' '||w[pos+3]),1,15) AS BIGINT) AS h
      |      FROM g),
      |m AS (SELECT doc_id, pos,
      |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
      |        count(*) OVER (PARTITION BY doc_id) AS n FROM s),
      |f AS (SELECT DISTINCT doc_id, fp FROM m
      |      WHERE pos <= greatest(n - 5, 0)),
      |rare AS (SELECT f.doc_id, f.fp FROM f
      |         JOIN (SELECT fp FROM f GROUP BY fp
      |               HAVING count(*) <= 100) r USING (fp))
      |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
      |FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY d1, d2""".stripMargin

  /** Incremental fingerprint matching
    * ([[Corpus.incrementalWinnowMatches]]): the base corpus's winnowed
    * index is read from the STAGED store (winnowing is per-doc, so the
    * staged full index filtered to base ids IS the stored base index),
    * and the document-frequency prune reads the STAGED (fp, df) stats
    * table — at scale both are maintained tables ([[Corpus
    * .winnowDfStats]] merged by addition per batch), so a maintenance
    * batch costs one delta-sized aggregate + fp-keyed probes, never a
    * re-aggregation of the base population (the r17 O(base) debt).
    * Only the delta is fingerprinted; base×base pairs are never
    * re-formed. The oracle replays the full-batch operator and
    * restricts to pairs touching the delta — the recall-equivalence
    * the incremental form must honor. */
  def qWinnowIncr(s: SparkSession, dir: String): DataFrame = {
    val baseFps = winnowFpsStaged(s, dir).where(col("doc_id") % 5 =!= 0)
    val baseStats = graft.Staging.stage(s, s"winnow:dfstats:$dir") {
      graft.operators.Corpus.winnowDfStats(
        winnowFpsStaged(s, dir).where(col("doc_id") % 5 =!= 0))
    }
    val deltaDocs = Tables.documents(s, dir).where(col("doc_id") % 5 === 0)
    graft.operators.Corpus.incrementalWinnowMatches(
        baseFps, baseStats, deltaDocs, "doc_id", "text",
        shingleSize = 3, window = 5, minShared = 2, maxDocFreq = 100)
      .orderBy(col("d1"), col("d2"))
  }

  val qWinnowIncrSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(range(len(w) - 2)) AS pos, w FROM d),
      |s AS (SELECT doc_id, pos,
      |        try_cast('0x'||substr(md5(
      |          w[pos+1]||' '||w[pos+2]||' '||w[pos+3]),1,15) AS BIGINT) AS h
      |      FROM g),
      |m AS (SELECT doc_id, pos,
      |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp,
      |        count(*) OVER (PARTITION BY doc_id) AS n FROM s),
      |f AS (SELECT DISTINCT doc_id, fp FROM m
      |      WHERE pos <= greatest(n - 5, 0)),
      |rare AS (SELECT f.doc_id, f.fp FROM f
      |         JOIN (SELECT fp FROM f GROUP BY fp
      |               HAVING count(*) <= 100) r USING (fp))
      |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
      |FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY d1, d2""".stripMargin

  val qDedupPassagesSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(range(len(w) - 9)) AS i, w FROM d),
      |sp AS (SELECT DISTINCT doc_id,
      |         array_to_string(w[i+1:i+10], ' ') AS span FROM g)
      |SELECT span, COUNT(*) AS n_docs FROM sp
      |GROUP BY span HAVING COUNT(*) >= 2 ORDER BY span""".stripMargin

  /** The APPLY step (TextDedup.scrubDuplicatedSpans): duplicated
    * 10-word windows are scrubbed from every document except the
    * minimum-id keeper; the oracle replays the window hash election
    * and rebuilds each text with a DuckDB list comprehension over the
    * un-covered word indices. */
  def qDedupPassagesApply(s: SparkSession, dir: String): DataFrame =
    TextDedup.scrubDuplicatedSpans(
        Tables.documents(s, dir).select("doc_id", "text"), "doc_id", "text", 10)
      .orderBy(col("doc_id"))

  val qDedupPassagesApplySql: String =
    """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |wins AS (SELECT doc_id, i,
      |    try_cast('0x' || substr(md5(array_to_string(w[i+1:i+10], ' ')), 1, 15)
      |      AS BIGINT) AS h
      |  FROM d, unnest(range(len(w) - 9)) AS t(i)),
      |dups AS (SELECT h, min(doc_id) AS keeper
      |  FROM (SELECT DISTINCT doc_id, h FROM wins)
      |  GROUP BY h HAVING COUNT(*) >= 2),
      |cov AS (SELECT DISTINCT wins.doc_id, wins.i + u.j AS ix
      |  FROM wins JOIN dups USING (h), unnest(range(10)) AS u(j)
      |  WHERE wins.doc_id != dups.keeper),
      |covagg AS (SELECT doc_id, list(ix) AS cov FROM cov GROUP BY doc_id)
      |SELECT d.doc_id,
      |  -- COALESCE: DuckDB array_to_string of an EMPTY list is NULL
      |  -- (a fully-covered doc) where Spark array_join gives the
      |  -- empty string
      |  CASE WHEN c.cov IS NULL THEN d.text
      |    ELSE COALESCE(array_to_string(
      |      [w[ix+1] FOR ix IN range(len(w)) IF NOT list_contains(c.cov, ix)],
      |      ' '), '') END AS text
      |FROM d LEFT JOIN covagg c ON d.doc_id = c.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Duplicate-CLUSTER resolution: the near-dup pairs say "same
    * document"; connected components turn them into deletion sets with
    * a canonical (minimum) id per set — [[Graph.connectedComponents]]
    * min-label propagation, whose fixpoint the oracle replays as a
    * recursive CTE (min reachable id). */
  def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    dedupCc05Staged(s, dir)
      .orderBy(col("id"))

  /** Shared recursive-closure block over a pair relation (used by the
    * cluster oracle, the dedup-apply oracle and the composed pipeline
    * oracles — one source, no drift). */
  private[queries] def ccClosureCteOver(rel: String): String =
    s"""und AS (SELECT d1 AS a, d2 AS b FROM $rel
      |        UNION SELECT d2, d1 FROM $rel),
      |reach(id, r) AS (
      |  SELECT DISTINCT a, a FROM und
      |  UNION
      |  SELECT u.a, reach.r FROM und u JOIN reach ON u.b = reach.id)""".stripMargin
  private[queries] val ccClosureCte: String = ccClosureCteOver("pairs")

  /** The min-reachable canonical per node — the CTE every CC-consuming
    * oracle chains after [[ccClosureCte]]; one definition so the
    * replayed canonicalization can never drift between gates. */
  private[queries] val ccCompsCte: String =
    "comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)"

  val qDedupClustersSql: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |$ccClosureCte
       |SELECT id, min(r) AS comp FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** The duplication REPORT over the staged τ = 0.5 clusters: cluster-
    * size histogram with per-size document and removable counts,
    * singletons (docs in no near-dup pair) included as size-1 rows —
    * the first table a curation review reads (total dup rate, and
    * whether duplication is a few giant templates or a long tail of
    * pairs, which decide scrub-vs-drop strategy). All integer
    * arithmetic; cluster sizes and the corpus total are one aggregate
    * each over already-staged relations. */
  def qDedupReport(s: SparkSession, dir: String): DataFrame = {
    val cc = dedupCc05Staged(s, dir)
    val hist = cc.groupBy(col("comp")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
    val singles = Tables.documents(s, dir).agg(count(lit(1)).as("_n"))
      .crossJoin(cc.agg(count(lit(1)).as("_m")))
      .select(lit(1L).as("size"), (col("_n") - col("_m")).as("n_clusters"))
    hist.unionByName(singles)
      .groupBy(col("size")) // defensive: CC cannot emit size-1 rows
      .agg(sum(col("n_clusters")).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"),
        ((col("size") - 1) * col("n_clusters")).as("removable"))
      .orderBy(col("size"))
  }

  val qDedupReportSql: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |$ccClosureCte,
       |$ccCompsCte,
       |sz AS (SELECT comp, count(*) AS size FROM comps GROUP BY comp),
       |hist AS (SELECT size, count(*) AS n_clusters FROM sz GROUP BY size),
       |tot AS (SELECT count(*) AS n FROM documents),
       |m AS (SELECT count(*) AS m FROM comps),
       |uni AS (SELECT size, n_clusters FROM hist
       |        UNION ALL SELECT 1, n - m FROM tot, m),
       |h2 AS (SELECT size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
       |  FROM uni GROUP BY size)
       |SELECT CAST(size AS BIGINT) AS size, n_clusters,
       |  CAST(size * n_clusters AS BIGINT) AS n_docs,
       |  CAST((size - 1) * n_clusters AS BIGINT) AS removable
       |FROM h2 ORDER BY size""".stripMargin

  /** The dedup end-cap: materialize the surviving corpus after near-dup
    * clustering — every non-canonical cluster member (comp ≠ id) is
    * dropped via a planner-chosen anti-join (Graph.dropDuplicates
    * deliberately leaves broadcast to the planner/AQE); unclustered
    * documents survive untouched. Returns (doc_id, n_tokens). */
  def qDedupApply(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val labels = dedupCc05Staged(s, dir)
    Graph.dropDuplicates(docs, "doc_id", labels)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val qDedupApplySql: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |$ccClosureCte,
       |$ccCompsCte,
       |kill AS (SELECT id FROM comps WHERE comp <> id)
       |SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |FROM documents WHERE doc_id NOT IN (SELECT id FROM kill)
       |ORDER BY doc_id""".stripMargin

  /** Keep-BEST dedup apply ([[Graph.keepBest]]): same clustering as
    * q_dedup_apply, but each cluster keeps its longest member (ties to
    * the larger id) — the policy real pipelines use instead of
    * keep-min-id. Returns the surviving (doc_id, n_chars). */
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val labels = dedupCc05Staged(s, dir)
    Graph.keepBest(docs, "doc_id", labels, "n_chars")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val qDedupKeepBestSql: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |$ccClosureCte,
       |$ccCompsCte,
       |m AS (SELECT c.comp, d.doc_id, d.n_chars
       |      FROM comps c JOIN documents d ON d.doc_id = c.id),
       |rk AS (SELECT doc_id, row_number() OVER (PARTITION BY comp
       |         ORDER BY n_chars DESC, doc_id DESC) AS rk FROM m),
       |kill AS (SELECT doc_id FROM rk WHERE rk > 1)
       |SELECT doc_id, n_chars FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM kill)
       |ORDER BY doc_id""".stripMargin

  /** Survivorship merge over the minhash duplicate clusters
    * ([[Graph.goldenRecords]]): one golden row per cluster with
    * per-field rules — min-id key, longest-doc source (ties larger
    * id), modal language (ties smaller) — plus singletons passing
    * through; the record-linkage MERGE end-cap after detect+closure. */
  def qGolden(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val labels = dedupCc05Staged(s, dir)
    Graph.goldenRecords(docs, "doc_id", labels, "n_chars", "lang")
      .orderBy(col("golden_id"))
  }

  val qGoldenSql: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |$ccClosureCte,
       |$ccCompsCte,
       |m AS (SELECT c.comp, d.doc_id, d.n_chars, d.lang
       |      FROM comps c JOIN documents d ON d.doc_id = c.id),
       |lc AS (SELECT comp, lang, count(*) AS c FROM m GROUP BY comp, lang),
       |modal AS (SELECT comp, lang AS modal_cat FROM (
       |    SELECT comp, lang, row_number() OVER (PARTITION BY comp
       |      ORDER BY c DESC, lang) AS rk FROM lc) WHERE rk = 1),
       |src AS (SELECT comp, doc_id AS src_longest FROM (
       |    SELECT comp, doc_id, row_number() OVER (PARTITION BY comp
       |      ORDER BY n_chars DESC, doc_id DESC) AS rk FROM m)
       |  WHERE rk = 1),
       |ag AS (SELECT comp, min(doc_id) AS golden_id,
       |    count(*) AS n_members, max(n_chars) AS len_longest
       |  FROM m GROUP BY comp),
       |merged AS (SELECT golden_id, n_members, src_longest, len_longest,
       |    modal_cat
       |  FROM ag JOIN modal USING (comp) JOIN src USING (comp)),
       |singles AS (SELECT doc_id AS golden_id, CAST(1 AS BIGINT)
       |    AS n_members, doc_id AS src_longest, n_chars AS len_longest,
       |    lang AS modal_cat
       |  FROM documents WHERE doc_id NOT IN (SELECT id FROM comps))
       |SELECT * FROM merged UNION ALL SELECT * FROM singles
       |ORDER BY golden_id""".stripMargin

  // --- embedding-cosine near-dup ---------------------------------------

  /** Corpus with injected exact-duplicate vectors (every 25th vec_id
    * re-appears shifted) — the natural corpus has no high-cosine pairs
    * (background max ≈ 0.51), which would make the operator vacuously
    * empty. At threshold 0.9 only the injected pairs qualify, and
    * identical vectors always share their LSH bucket, so recall is
    * exactly 1 and the brute-force oracle is a complete ground truth. */
  def qDedupEmbed(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val dups = e.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    Similarity.cosineNearDups(e.unionAll(dups), threshold = 0.9,
        numPlanes = NumPlanes, dim = Dim)
      .orderBy(col("d1"), col("d2"))
  }

  val qDedupEmbedSql: String =
    """WITH all_e AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 25 = 0),
      |p AS (
      |  SELECT a.vec_id AS d1, b.vec_id AS d2,
      |    list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |    (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |     sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
      |  FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id)
      |SELECT d1, d2, round(cos, 6) AS cosine FROM p
      |WHERE cos >= 0.9 ORDER BY d1, d2""".stripMargin

  /** INCREMENTAL embedding dedup — the SemDeDup maintenance shape: the
    * injected-clone batch (every 25th vector, shifted ids) arrives as
    * the DELTA against the already-quantized original corpus. The
    * quantizer is fixed from the BASE (its % 29 sample — the table
    * built when base was built); only delta-side pairs are formed, so
    * base×base work never re-runs. An exact clone lands in its
    * original's cell (identical vector → identical argmin), so cell
    * scoping loses nothing at τ = 0.9 and the brute-force oracle
    * restricted to delta-touching pairs is a complete ground truth —
    * the same recall argument as q_dedup_embed. */
  def qDedupIncrEmbed(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val delta = e.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val centroids = e.toDF("cid", "c").where(col("cid") % CentroidMod === 0)
    // hierarchical quantizer, same rationale as q_semdedup: this
    // gate's centroid table tracks the corpus, so the flat base
    // re-assign (the stored-table stand-in) measured 229× at the
    // two-decade stress. The brute-force oracle is UNCHANGED — it is
    // complete ground truth for any deterministic quantizer on this
    // fixture (every ≥0.9 pair is an exact clone pair, and identical
    // vectors route identically at both layers).
    Similarity.incrementalCosineNearDups(e, delta, centroids, threshold = 0.9,
        assign = Similarity.ivfAssignHierarchical)
      .orderBy(col("d1"), col("d2"))
  }

  val qDedupIncrEmbedSql: String =
    """WITH all_e AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 25 = 0),
      |p AS (
      |  SELECT a.vec_id AS d1, b.vec_id AS d2,
      |    list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |    (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |     sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
      |  FROM all_e a JOIN all_e b ON a.vec_id < b.vec_id)
      |SELECT d1, d2, round(cos, 6) AS cosine FROM p
      |WHERE cos >= 0.9 AND (d1 >= 100000 OR d2 >= 100000)
      |ORDER BY d1, d2""".stripMargin

  // --- SemDeDup (cluster-scoped semantic dedup) -------------------------

  /** SemDeDup (Similarity.semDedupLabels): semantic near-dup removal
    * scoped to embedding clusters — the q_dedup_embed fixture (every
    * 25th vector re-injected under a shifted id) run through the
    * cell-quantize → within-cell exact cosine → connected-components
    * pipeline, returning the SURVIVING corpus ids. An exact duplicate
    * always lands in its original's cell (identical vector, identical
    * argmin with the same tie order), so the injected pairs are
    * guaranteed within-cell and every shifted clone must die. The
    * oracle replays the quantizer (the IVF CTE), the cell-scoped
    * cosine pairs, and the component closure. */
  def qSemdedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val dups = e.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val all = e.unionAll(dups)
    val centroids = all.toDF("cid", "c").where(col("cid") % CentroidMod === 0)
    // hierarchical quantizer: THIS gate's centroid table tracks the
    // corpus (k = n/29), so the flat n·k argmin is quadratic in n —
    // the measured 79.5× two-decade ratio was ~all assignment cost.
    // Two-level routing (g = ⌈√k⌉ supers → within-group argmin) makes
    // it n·2√k; the oracle replays the identical two-layer
    // (score, cid) argmin, and exact clones still land in their
    // original's cell (deterministic routing of identical vectors).
    val labels = Similarity.semDedupLabels(all, centroids, threshold = 0.9,
      assign = Similarity.ivfAssignHierarchical)
    graft.operators.Graph.dropDuplicates(all, "vec_id", labels)
      .select(col("vec_id")).orderBy(col("vec_id"))
  }

  /** The TWO-LEVEL (coarse-then-fine) assignment CTE chain — the SQL
    * replay of [[graft.operators.Similarity.ivfAssignHierarchical]]:
    * g = ⌈√k⌉ supers cut every ⌈k/g⌉-th centroid in cid order, both
    * centroids and vectors route to their nearest super under the
    * (score, cid) argmin, then the fine argmin runs within the routed
    * group. Expects CTEs `v (vec_id, e)` and `cent (cid, c)` upstream;
    * emits `assigned (vid, e, cell)`. ONE definition shared by
    * qSemdedupSql and qAnnIvf2Sql so the two oracles can never drift. */
  private val twoLevelAssignCtes: String =
    """prm AS (SELECT k, g, (k + g - 1) // g AS step FROM (
      |  SELECT count(*) AS k, CAST(ceil(sqrt(count(*))) AS BIGINT) AS g
      |  FROM cent)),
      |sup AS (SELECT cid AS scid, c AS sc FROM (
      |    SELECT cid, c, row_number() OVER (ORDER BY cid) AS rn FROM cent) t, prm
      |  WHERE (rn - 1) % step = 0),
      |cgrp AS (
      |  SELECT cid, c, scid AS grp FROM (
      |    SELECT cent.cid, cent.c, sup.scid,
      |      row_number() OVER (PARTITION BY cent.cid ORDER BY
      |        list_inner_product(sc, sc) - 2.0 * list_inner_product(cent.c, sc),
      |        scid) AS rn
      |    FROM cent, sup) WHERE rn = 1),
      |vgrp AS (
      |  SELECT vid, e, scid AS grp FROM (
      |    SELECT v.vec_id AS vid, v.e, sup.scid,
      |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |        list_inner_product(sc, sc) - 2.0 * list_inner_product(v.e, sc),
      |        scid) AS rn
      |    FROM v, sup) WHERE rn = 1),
      |assigned AS (
      |  SELECT vid, e, cid AS cell FROM (
      |    SELECT vgrp.vid, vgrp.e, cgrp.cid,
      |      row_number() OVER (PARTITION BY vgrp.vid ORDER BY
      |        list_inner_product(cgrp.c, cgrp.c)
      |          - 2.0 * list_inner_product(vgrp.e, cgrp.c),
      |        cid) AS rn
      |    FROM vgrp JOIN cgrp ON vgrp.grp = cgrp.grp) WHERE rn = 1)""".stripMargin

  // def, not val: CentroidMod is declared further down the object body
  // and a forward VAL reference would interpolate its default (0) at
  // object init
  def qSemdedupSql: String =
    s"""WITH RECURSIVE all_e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 25 = 0),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM all_e),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |$twoLevelAssignCtes,
       |pairs AS (
       |  SELECT a.vid AS d1, b.vid AS d2
       |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vid < b.vid
       |  WHERE list_inner_product(a.e, b.e) /
       |    (sqrt(list_inner_product(a.e, a.e)) *
       |     sqrt(list_inner_product(b.e, b.e))) >= 0.9),
       |$ccClosureCte,
       |labels AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
       |SELECT vec_id FROM all_e
       |WHERE vec_id NOT IN (SELECT id FROM labels WHERE comp != id)
       |ORDER BY vec_id""".stripMargin

  // --- SimHash near-dup -------------------------------------------------

  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    TextDedup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("d1"), col("d2"))

  val qDedupSimhashSql: String = {
    val bits = TextDedup.SimBits
    val sums = (0 until bits).map(j =>
      s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(",\n  ")
    val assemble = (0 until bits).map(j =>
      s"(CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |           FROM documents),
       |h AS (SELECT doc_id, try_cast('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM w),
       |s AS (SELECT doc_id,
       |  $sums
       |  FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $assemble AS simhash FROM s),
       |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
       |        bit_count(xor(a.simhash, b.simhash)) AS hamming
       |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT d1, d2, CAST(hamming AS INT) AS hamming FROM p
       |WHERE hamming <= ${TextDedup.SimMaxHamming} ORDER BY d1, d2""".stripMargin
  }

  // --- text analysis ----------------------------------------------------

  private[queries] val enStops = TextStats.stopwordProfiles("en")

  def qTextStats(s: SparkSession, dir: String): DataFrame = {
    // tokenize once; every fold-shaped stat comes out of the one-pass
    // native kernel (graft.functions.NativeTextStats — the HOF
    // formulations it replaced are parity-tested in TextStatsSpec),
    // and the ratio columns derive by the same double divisions the
    // oracle replays
    val staged = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), TextStats.words(col("text")).as("_w"))
      .select(col("doc_id"), col("text"),
        TextStats.tokenCountFromWords(col("_w")).as("n_tokens"),
        graft.functions.NativeTextStats.textStats(col("_w"), enStops).as("_r"))
      .select(col("doc_id"),
        col("n_tokens"),
        col("_r.n_subwords").as("n_subwords"),
        TextStats.bpeTokenCount(col("text")).as("n_bpe"),
        col("_r.n_distinct").as("n_distinct"),
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          col("_r.sum_len").cast("double") / col("n_tokens").cast("double"))
          .as("avg_len"),
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          col("_r.stop_hits").cast("double") / col("n_tokens").cast("double"))
          .as("stop_en"),
        col("_r.fp").as("fp"))
    staged.select(col("doc_id"), col("n_tokens"), col("n_subwords"),
      col("n_bpe"), col("n_distinct"), col("avg_len"), col("stop_en"),
      // flags recomputed from the already-materialized stats
      concat_ws(",",
        when(col("n_tokens") < 20, "too_short"),
        when(col("n_distinct").cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double") < 0.3, "low_diversity"),
        when(col("avg_len") > 12.0, "long_tokens")).as("flags"),
      col("fp"),
    ).orderBy(col("doc_id"))
  }

  val qTextStatsSql: String = {
    val stopsIn = enStops.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |m AS (SELECT doc_id, text, w,
      |  len(w) AS n_tokens,
      |  CAST(list_sum(list_transform(w, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
      |  CAST(len(regexp_extract_all(text, 'BPEPAT')) AS BIGINT) AS n_bpe,
      |  len(list_distinct(w)) AS n_distinct,
      |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_len,
      |  CAST(list_sum(list_transform(w, x -> CASE WHEN lower(x) IN (STOPS) THEN 1 ELSE 0 END)) AS DOUBLE)
      |    / CAST(len(w) AS DOUBLE) AS stop_en,
      |  list_min(list_transform(range(len(w) - 2),
      |    i -> try_cast('0x' || substr(md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]), 1, 15) AS BIGINT))) AS fp
      |  FROM t)
      |SELECT doc_id, n_tokens, n_subwords, n_bpe, n_distinct, avg_len, stop_en,
      |  concat_ws(',',
      |    CASE WHEN n_tokens < 20 THEN 'too_short' END,
      |    CASE WHEN CAST(n_distinct AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) < 0.3
      |         THEN 'low_diversity' END,
      |    CASE WHEN avg_len > 12.0 THEN 'long_tokens' END) AS flags,
      |  fp
      |FROM m ORDER BY doc_id""".stripMargin.replace("STOPS", stopsIn)
      .replace("BPEPAT", TextStats.BpePattern.replace("'", "''"))
  }

  /** The quality-filter end-cap: combine the text-stats, repetition,
    * and language signals into one C4/Gopher-style keep decision and
    * materialize the surviving corpus — the step a training-data
    * pipeline actually ships. One scan, all native kernels, no
    * shuffle; each signal reuses the exact formulation its own gated
    * query proves. */
  def qQualityFilter(s: SparkSession, dir: String): DataFrame =
    qualitySurvivors(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("lang_pred"))
      .orderBy(col("doc_id"))

  /** The quality-filter keep decision as a reusable stage: input rows
    * that survive the C4/Gopher signals, with every INPUT column
    * passed through plus `n_tokens` and `lang_pred` — so a composed
    * pipeline ([[PipelineQueries.qPipeline]]) gets the surviving
    * corpus without a self-join back onto the scan. One scan, all
    * native kernels, zero shuffle. */
  private[graft] def qualitySurvivors(docs: DataFrame): DataFrame = {
    // sorted: the kernel breaks score ties first-profile-wins and the
    // oracle's CASE chain is alphabetical — unsorted Map order would
    // diverge on tied documents
    val profiles = TextStats.stopwordProfiles.toSeq.sortBy(_._1)
    // ONE tokenization (single-space split, the oracle's string_split)
    // for every signal in the keep decision — mixing \s+ and ' ' splits
    // would disagree on tabs/double spaces
    val staged = docs
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("_t", graft.functions.NativeTextStats.textStats(
        split(col("text"), " "), enStops))
      .withColumn("_r", graft.functions.NativeText.repetitionStats(
        split(col("text"), " ")))
      .withColumn("lang_pred", graft.functions.NativeTextStats.langId(
        split(lower(col("text")), " "), profiles))
    val tooShort = col("n_tokens") < 20
    val lowDiv = col("_t.n_distinct").cast("double") /
      greatest(col("n_tokens"), lit(1)).cast("double") < 0.3
    val longTok = (col("_t.sum_len").cast("double") /
      col("n_tokens").cast("double")) > 12.0
    val repetitive = col("_r.n_words") >= 3 &&
      (col("_r.dup2").cast("double") /
        (col("_r.n_words") - 1).cast("double")) > 0.3
    val wrongLang = col("lang_pred") =!= "en"
    staged
      .filter(!tooShort && !lowDiv && !longTok && !repetitive && !wrongLang)
      .drop("_t", "_r")
  }

  /** Shared bigram-duplication CTEs over a `t(doc_id, w)` word-list CTE
    * — dup2 = bigram occurrences belonging to repeated bigrams (used by
    * the repetition oracle and the quality-filter oracle). */
  private[queries] val bigramDupCte: String =
    """g2 AS (SELECT doc_id, w[i+1] || ' ' || w[i+2] AS g
      |       FROM (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM t)),
      |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
      |a2 AS (SELECT doc_id, COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup2
      |       FROM c2 GROUP BY 1)""".stripMargin

  val qQualityFilterSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |m AS (SELECT doc_id, len(w) AS n_tokens,
       |  len(list_distinct(w)) AS n_distinct,
       |  CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len
       |  FROM t),
       |$bigramDupCte,
       |sc AS (SELECT doc_id,
       |  $langScoreColsSql
       |  FROM t),
       |lang AS (SELECT doc_id,
       |  $langArgmaxSql AS lang_pred
       |  FROM sc)
       |SELECT m.doc_id, m.n_tokens, lang.lang_pred
       |FROM m JOIN lang ON m.doc_id = lang.doc_id
       |  LEFT JOIN a2 ON m.doc_id = a2.doc_id
       |WHERE NOT (m.n_tokens < 20)
       |  AND NOT (CAST(n_distinct AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) < 0.3)
       |  AND NOT (CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 12.0)
       |  AND NOT (n_tokens >= 3 AND
       |    CAST(COALESCE(dup2, 0) AS DOUBLE) / CAST(n_tokens - 1 AS DOUBLE) > 0.3)
       |  AND lang_pred = 'en'
       |ORDER BY m.doc_id""".stripMargin

  /** Gopher/C4-style repetition quality signals per document via the
    * one-pass native kernel
    * ([[graft.functions.NativeText.repetitionStats]]): duplicate-word
    * fraction, most-frequent-bigram/trigram coverage, and the fraction
    * of bigram occurrences inside repeated bigrams. Counts come out of
    * the kernel as integers; every fraction is derived with plain
    * double division so the DuckDB oracle replays the arithmetic
    * bit-for-bit. Documents shorter than 3 words are excluded on both
    * sides (degenerate trigram denominator). Per-row work only — at
    * corpus scale this is a single scan with no shuffle at all. */
  def qQualityRep(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.NativeText.repetitionStats(split(col("text"), " ")).as("r"))
      .where(col("r.n_words") >= 3)
      .select(col("doc_id"),
        col("r.n_words").as("n_words"),
        col("r.n_distinct").as("n_distinct"),
        (lit(1.0) - col("r.n_distinct").cast("double") /
          col("r.n_words").cast("double")).as("dup_word_frac"),
        (col("r.top2").cast("double") /
          (col("r.n_words") - 1).cast("double")).as("top2_frac"),
        (col("r.dup2").cast("double") /
          (col("r.n_words") - 1).cast("double")).as("dup2_frac"),
        (col("r.top3").cast("double") /
          (col("r.n_words") - 2).cast("double")).as("top3_frac"))
      .orderBy(col("doc_id"))

  val qQualityRepSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |base AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct FROM d),
      |g2 AS (SELECT doc_id, w[i+1] || ' ' || w[i+2] AS g
      |       FROM (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM d)),
      |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
      |a2 AS (SELECT doc_id, max(c) AS top2,
      |              COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup2
      |       FROM c2 GROUP BY 1),
      |g3 AS (SELECT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS g
      |       FROM (SELECT doc_id, unnest(range(len(w) - 2)) AS i, w FROM d)),
      |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
      |a3 AS (SELECT doc_id, max(c) AS top3 FROM c3 GROUP BY 1)
      |SELECT b.doc_id, b.n_words, b.n_distinct,
      |  1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac,
      |  CAST(top2 AS DOUBLE) / CAST(n_words - 1 AS DOUBLE) AS top2_frac,
      |  CAST(dup2 AS DOUBLE) / CAST(n_words - 1 AS DOUBLE) AS dup2_frac,
      |  CAST(top3 AS DOUBLE) / CAST(n_words - 2 AS DOUBLE) AS top3_frac
      |FROM base b JOIN a2 USING (doc_id) JOIN a3 USING (doc_id)
      |WHERE n_words >= 3
      |ORDER BY doc_id""".stripMargin

  /** Token-length distribution per source — the corpus-profiling report
    * every mixing decision starts from: doc count, mean tokens, and
    * exact interpolated quartiles/p90. Exact `percentile` (not approx)
    * so the DuckDB `quantile_cont` replays it; both engines use linear
    * interpolation over the sorted values and the result is rounded
    * before comparison. The mean goes through exact decimal so partial
    * aggregation order can't move the double (Tables.Money pattern). */
  def qLenQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_tokens").cast(graft.Tables.Money)).cast("double") /
          count(lit(1))).as("avg_tokens"),
        expr("percentile(n_tokens, array(0.25D, 0.5D, 0.75D, 0.9D))").as("_q"))
      .select(col("source"), col("n_docs"), round(col("avg_tokens"), 6).as("avg_tokens"),
        round(element_at(col("_q"), 1), 6).as("p25"),
        round(element_at(col("_q"), 2), 6).as("p50"),
        round(element_at(col("_q"), 3), 6).as("p75"),
        round(element_at(col("_q"), 4), 6).as("p90"))
      .orderBy(col("source"))

  val qLenQuantilesSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  round(CAST(SUM(CAST(n_tokens AS DECIMAL(20,2))) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
      |  round(quantile_cont(n_tokens, 0.25), 6) AS p25,
      |  round(quantile_cont(n_tokens, 0.5), 6) AS p50,
      |  round(quantile_cont(n_tokens, 0.75), 6) AS p75,
      |  round(quantile_cont(n_tokens, 0.9), 6) AS p90
      |FROM (SELECT source, len(string_split(text, ' ')) AS n_tokens FROM documents)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Per-source quota sampling: 25 documents per `source`, picked in
    * content-hash order ([[Corpus.quotaSample]]) — the deterministic
    * corpus-mixing draw. The oracle replays the identical md5-derived
    * ordering with a QUALIFY row_number. */
  def qSampleQuota(s: SparkSession, dir: String): DataFrame =
    Corpus.quotaSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        groupCol = "source", idCol = "doc_id", k = 25)
      .orderBy(col("source"), col("pick_rank"))

  val qSampleQuotaSql: String =
    """SELECT source, doc_id, CAST(rn AS INT) AS pick_rank FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
      |      doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 25 ORDER BY source, pick_rank""".stripMargin

  /** PII scrubbing over the documents table. The synthetic corpus
    * carries no PII, so deterministic PII is staged in first (emails on
    * every 7th doc, NANP phones on every 11th, IPv4 hosts on every
    * 13th — all derived from doc_id so the oracle stages byte-identical
    * text), then [[Corpus.piiScrub]] redacts and counts. The output
    * carries the scrubbed text's md5 rather than the text itself. */
  def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val staged = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.org for details"))).otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
        when(col("doc_id") % 13 === 0,
          concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
            lit(".0.4 logged"))).otherwise("")).as("text"))
    Corpus.piiScrub(staged, "text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("text").cast("binary")).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  val qPiiScrubSql: String = {
    val pats = Corpus.PiiPatterns
    // DuckDB single-quoted strings are standard SQL: backslashes pass
    // through to RE2 literally, so the Java pattern embeds unchanged
    val countCols = pats.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS INT) AS n_$name"
    }.mkString(",\n  ")
    val scrubbed = pats.foldLeft("text") { case (e, (_, pat, repl)) =>
      s"regexp_replace($e, '$pat', '$repl', 'g')"
    }
    s"""WITH staged AS (
       |  SELECT doc_id, text ||
       |    (CASE WHEN doc_id % 7 = 0
       |      THEN ' contact u' || doc_id || '@example.org for details' ELSE '' END) ||
       |    (CASE WHEN doc_id % 11 = 0
       |      THEN ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |           || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
       |    (CASE WHEN doc_id % 13 = 0
       |      THEN ' host 10.' || (doc_id % 256) || '.0.4 logged' ELSE '' END) AS text
       |  FROM documents)
       |SELECT doc_id,
       |  $countCols,
       |  md5($scrubbed) AS scrub_md5
       |FROM staged ORDER BY doc_id""".stripMargin
  }

  /** Deterministic content-hash dataset split (90/5/5): a document's
    * assignment never changes under re-runs, repartitioning, or corpus
    * growth. md5-based so the oracle replays it exactly. */
  def qSplitHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Corpus.hashSplit(col("doc_id"), trainPct = 90, valPct = 5).as("split"))
      .orderBy(col("doc_id"))

  /** The 90/5/5 md5 hash-classify block shared by q_split_hash and
    * q_split_safe — one definition of the thresholds and the hash60
    * replay so the two split oracles can never drift. */
  private def hashSplitClassifySql(cols: String, keyExpr: String,
      from: String): String =
    s"""SELECT $cols,
       |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT $cols,
       |        try_cast('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15)
       |          AS BIGINT) % 100 AS h
       |      FROM $from)
       |ORDER BY doc_id""".stripMargin

  val qSplitHashSql: String =
    hashSplitClassifySql("doc_id", "doc_id", "documents")

  /** LEAKAGE-SAFE dataset split under the gate: near-dup clusters must
    * never straddle the train/test boundary (a test document with a
    * training near-twin is leaked evaluation — the split-level cousin
    * of decontamination), so the deterministic content-hash split
    * keys on each document's CLUSTER CANONICAL — the staged τ=0.5
    * minhash CC label; unclustered documents are their own canonical —
    * instead of the document id: every cluster member inherits its
    * representative's assignment BY CONSTRUCTION (SplitSafeSpec pins
    * it against the gated pair list). Composition of the gated
    * clustering and the gated hashSplit; the oracle reuses both
    * gates' own fragments. Plan cost beyond the staged labels: one
    * left join + the stateless hash classify. */
  def qSplitSafe(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val labels = dedupCc05Staged(s, dir)
    docs.join(labels, docs("doc_id") === labels("id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("rep"))
      .select(col("doc_id"), col("rep"),
        Corpus.hashSplit(col("rep"), trainPct = 90, valPct = 5).as("split"))
      .orderBy(col("doc_id"))
  }

  val qSplitSafeSql: String =
    s"""WITH RECURSIVE $minhashPairsCte,
       |$ccClosureCte,
       |$ccCompsCte,
       |rep AS (SELECT d.doc_id, coalesce(comps.comp, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN comps ON comps.id = d.doc_id)
       |${hashSplitClassifySql("doc_id, rep", "rep", "rep")}""".stripMargin

  /** Benchmark decontamination over the documents table: every 50th
    * document plays the held-out benchmark; corpus documents sharing
    * ≥3 distinct 5-grams with any benchmark doc are flagged. The
    * synthetic corpus has exactly the planted near-dup overlaps
    * (background 5-gram collisions are zero), so the result is the
    * contamination ground truth the string-join oracle replays. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Corpus.decontaminate(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text")
      .orderBy(col("doc_id"), col("bench_id"))
  }

  val qDecontaminateSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |        w[i+4] || ' ' || w[i+5] AS s
      |      FROM (SELECT doc_id, unnest(range(len(w) - 4)) AS i, w FROM d)),
      |bench AS (SELECT doc_id AS bench_id, s FROM g WHERE doc_id % 50 = 0),
      |corp AS (SELECT doc_id, s FROM g WHERE doc_id % 50 != 0)
      |SELECT corp.doc_id, bench.bench_id, count(*) AS n_shared
      |FROM corp JOIN bench USING (s)
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY doc_id, bench_id""".stripMargin

  /** Decontamination end-cap: the surviving corpus after dropping every
    * document [[Corpus.decontaminate]] flags — detection's anti-join
    * twin (q_dedup_apply's relationship to q_dedup_clusters). The
    * flagged set is contamination-sized, so the planner broadcasts it
    * when it fits; the corpus never shuffles. */
  def qDecontaminateApply(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val corpus = docs.where(col("doc_id") % 50 =!= 0)
    val flagged = Corpus.decontaminate(
      corpus, docs.where(col("doc_id") % 50 === 0), "doc_id", "text")
    corpus.join(flagged.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val qDecontaminateApplySql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
      |        w[i+4] || ' ' || w[i+5] AS s
      |      FROM (SELECT doc_id, unnest(range(len(w) - 4)) AS i, w FROM d)),
      |bench AS (SELECT doc_id AS bench_id, s FROM g WHERE doc_id % 50 = 0),
      |corp AS (SELECT doc_id, s FROM g WHERE doc_id % 50 != 0),
      |flagged AS (
      |  SELECT corp.doc_id FROM corp JOIN bench USING (s)
      |  GROUP BY corp.doc_id, bench.bench_id HAVING count(*) >= 3)
      |SELECT doc_id, n_chars FROM documents
      |WHERE doc_id % 50 != 0
      |  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM flagged)
      |ORDER BY doc_id""".stripMargin

  /** GPT-style sequence packing: documents laid end-to-end in doc_id
    * order and cut into 1024-token training sequences; each document
    * reports the chunk span it occupies. The running-total window is
    * the oracle-checkable specification of the per-shard packing a
    * 100 TB run would execute (same arithmetic, partitioned by shard). */
  def qPackChunks(s: SparkSession, dir: String): DataFrame =
    Corpus.packChunks(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens")),
        orderCol = "doc_id", tokensCol = "n_tokens", chunkTokens = 1024)
      .orderBy(col("doc_id"))

  val qPackChunksSql: String =
    """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |        SUM(n_tokens) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM t)
      |SELECT doc_id, n_tokens,
      |  CAST(FLOOR((cum - n_tokens) / 1024) AS BIGINT) AS first_chunk,
      |  CAST(FLOOR((cum - 1) / 1024) AS BIGINT) AS last_chunk,
      |  CAST((cum - n_tokens) % 1024 AS BIGINT) AS chunk_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** Production (per-shard) sequence packing — the scale form of
    * [[qPackChunks]]: shard = source, packed under the global
    * (source, doc_id) order via per-shard window cumsums plus
    * broadcast per-shard base offsets (Corpus.packChunksSharded).
    * The oracle replays both levels: the partitioned local cumsum
    * and the exclusive running total over the 20-row shard table. */
  def qPackChunksSharded(s: SparkSession, dir: String): DataFrame =
    Corpus.packChunksSharded(
        Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens")),
        shardCol = "source", orderCol = "doc_id",
        tokensCol = "n_tokens", chunkTokens = 1024)
      .select(col("doc_id"), col("n_tokens"), col("first_chunk"),
        col("last_chunk"), col("chunk_offset"))
      .orderBy(col("doc_id"))

  val qPackChunksShardedSql: String =
    """WITH t AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      |           FROM documents),
      |l AS (SELECT source, doc_id, n_tokens,
      |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lcum
      |      FROM t),
      |b AS (SELECT source,
      |        SUM(tot) OVER (ORDER BY source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tot AS base
      |      FROM (SELECT source, SUM(n_tokens) AS tot FROM t GROUP BY source)),
      |c AS (SELECT doc_id, n_tokens, base + lcum AS cum
      |      FROM l JOIN b USING (source))
      |SELECT doc_id, n_tokens,
      |  CAST(FLOOR((cum - n_tokens) / 1024) AS BIGINT) AS first_chunk,
      |  CAST(FLOOR((cum - 1) / 1024) AS BIGINT) AS last_chunk,
      |  CAST((cum - n_tokens) % 1024 AS BIGINT) AS chunk_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** Weighted domain remixing: per-source target weights (derived
    * deterministically from the source number — 0.25× to 3.25× in 0.5
    * steps, so the fixture exercises sub-1 drop-sampling AND multi-epoch
    * up-sampling) materialized into a physical mixture by
    * [[Corpus.remixByWeights]]. The oracle replays the md5 fractional
    * draw and the generate_series replication exactly. */
  def qRemixWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val wts = docs.select(col("source")).distinct()
      .withColumn("wt_bp", lit(2500) +
        (substring(col("source"), 4, 10).cast("int") % 7) * 5000)
    Corpus.remixByWeights(docs, wts, keyCol = "source", idCol = "doc_id")
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** The remix-draw tail shared by every weighted-mixture oracle
    * (q_remix_weights, q_temperature_remix): whole copies + the md5
    * fractional draw from a `wt(source, wt_bp)` CTE in scope, then the
    * epoch replication — one definition so the replayed draw can never
    * drift between the gates that differ only in how weights are
    * DERIVED. */
  private val remixDrawTailSql: String =
    """d AS (SELECT doc_id, documents.source, wt_bp // 10000 +
      |        CASE WHEN try_cast('0x' ||
      |            substr(md5(CAST(doc_id AS VARCHAR) || ':remix'), 1, 15)
      |            AS BIGINT) % 10000 < wt_bp % 10000
      |          THEN 1 ELSE 0 END AS copies
      |      FROM documents JOIN wt USING (source))
      |SELECT doc_id, source,
      |  CAST(unnest(generate_series(0, copies - 1)) AS INT) AS epoch
      |FROM d WHERE copies >= 1
      |ORDER BY doc_id, epoch""".stripMargin

  val qRemixWeightsSql: String =
    s"""WITH wt AS (SELECT source,
       |        2500 + (CAST(substr(source, 4) AS INT) % 7) * 5000 AS wt_bp
       |      FROM (SELECT DISTINCT source FROM documents)),
       |$remixDrawTailSql""".stripMargin

  /** Temperature-scaled remixing under the gate: α = 0.3 weights
    * ([[Corpus.temperatureWeights]] — small sources up-sampled toward
    * uniform, large sources trimmed, corpus size preserved in
    * expectation) composed with the gated [[Corpus.remixByWeights]]
    * draw. The oracle replays the quantized normalizer, the
    * basis-point weight table, and the md5 fractional draw; pow's
    * engine wobble is absorbed by the micro-unit/basis-point
    * quantization (both constants are interpolated from the SAME
    * Scala doubles so the engines parse identical literals). */
  def qTemperatureRemix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    Corpus.remixByWeights(docs,
        Corpus.temperatureWeights(docs, "source", alpha = TempAlpha),
        keyCol = "source", idCol = "doc_id")
      .orderBy(col("doc_id"), col("epoch"))
  }

  private val TempAlpha = 0.3

  /** Mixture entropy before/after the α = 0.3 temperature remix
    * ([[Corpus.mixtureEntropy]] over [[Corpus.temperatureWeights]] +
    * [[Corpus.remixByWeights]]): the fixture's sources are
    * near-uniform, so the gate first SKEWS the mixture — source k
    * keeps every (1 + k mod 5)-th doc of its OWN stripe (doc ids are
    * striped mod 20 across sources, so the keep-modulus runs over
    * doc_id div 20, the position within the source; filtering on raw
    * doc_id would alias against the stripe and empty some sources
    * entirely). Sizes spread 5x; the remix must move the effective
    * domain count back toward 20 — the scorecard that says the
    * temperature knob DID something, measured on the same physical
    * draw the q_temperature_remix gate pins. */
  def qMixtureEntropy(s: SparkSession, dir: String): DataFrame = {
    val skewed = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .filter(expr("doc_id div 20") %
        (lit(1) + substring(col("source"), 4, 10).cast("int") % 5) === 0)
    val before = skewed.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val after = Corpus.remixByWeights(skewed,
        Corpus.temperatureWeights(skewed, "source", alpha = TempAlpha),
        keyCol = "source", idCol = "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    Corpus.mixtureEntropy(before, "n")
      .select(lit("1_raw").as("phase"), col("*"))
      .unionByName(Corpus.mixtureEntropy(after, "n")
        .select(lit("2_remixed").as("phase"), col("*")))
      .orderBy(col("phase"))
  }

  val qMixtureEntropySql: String =
    s"""WITH sk AS (SELECT doc_id, source FROM documents
       |  WHERE (doc_id // 20) % (1 + CAST(substr(source, 4) AS INT) % 5)
       |    = 0),
       |n AS (SELECT source, count(*) AS n FROM sk GROUP BY source),
       |z AS (SELECT CAST(sum(CAST(round(pow(CAST(n AS DOUBLE), $TempAlpha) * 1e6)
       |          AS BIGINT)) AS BIGINT) AS zq,
       |        CAST(sum(n) AS BIGINT) AS tot FROM n),
       |wt AS (SELECT source,
       |        CAST(round(1e4 * CAST(tot AS DOUBLE)
       |            * pow(CAST(n AS DOUBLE), ${TempAlpha - 1.0})
       |            / (CAST(zq AS DOUBLE) / 1e6)) AS BIGINT) AS wt_bp
       |      FROM n, z),
       |d AS (SELECT sk.source, wt_bp // 10000 +
       |        CASE WHEN try_cast('0x' ||
       |            substr(md5(CAST(doc_id AS VARCHAR) || ':remix'), 1, 15)
       |            AS BIGINT) % 10000 < wt_bp % 10000
       |          THEN 1 ELSE 0 END AS copies
       |      FROM sk JOIN wt USING (source)),
       |aft AS (SELECT source, CAST(sum(copies) AS BIGINT) AS n
       |  FROM d GROUP BY source HAVING sum(copies) >= 1),
       |st AS (
       |  SELECT '1_raw' AS phase, CAST(sum(n) AS BIGINT) AS n_total,
       |    ln(CAST(sum(n) AS DOUBLE))
       |      - sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))
       |        / CAST(sum(n) AS DOUBLE) AS h
       |  FROM n
       |  UNION ALL
       |  SELECT '2_remixed', CAST(sum(n) AS BIGINT),
       |    ln(CAST(sum(n) AS DOUBLE))
       |      - sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))
       |        / CAST(sum(n) AS DOUBLE)
       |  FROM aft)
       |SELECT phase, n_total, round(h, 6) + 0.0 AS entropy,
       |  round(exp(h), 6) + 0.0 AS eff_domains
       |FROM st ORDER BY phase""".stripMargin

  val qTemperatureRemixSql: String =
    s"""WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
       |z AS (SELECT CAST(sum(CAST(round(pow(CAST(n AS DOUBLE), $TempAlpha) * 1e6)
       |          AS BIGINT)) AS BIGINT) AS zq,
       |        CAST(sum(n) AS BIGINT) AS tot FROM n),
       |wt AS (SELECT source,
       |        CAST(round(1e4 * CAST(tot AS DOUBLE)
       |            * pow(CAST(n AS DOUBLE), ${TempAlpha - 1.0})
       |            / (CAST(zq AS DOUBLE) / 1e6)) AS BIGINT) AS wt_bp
       |      FROM n, z),
       |$remixDrawTailSql""".stripMargin

  /** Sliding-window chunking at maxLen=40, stride=30 over the documents
    * table (10-99 tokens/doc → 1-3 windows each, tail-clamp exercised
    * whenever (n − 40) is not a stride multiple). The oracle replays
    * the window arithmetic and the list-slice md5 per chunk. */
  def qChunkOverlap(s: SparkSession, dir: String): DataFrame =
    Corpus.chunkWithOverlap(Tables.documents(s, dir),
        idCol = "doc_id", textCol = "text", maxLen = 40, stride = 30)
      .orderBy(col("doc_id"), col("chunk_seq"))

  val qChunkOverlapSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |d AS (SELECT doc_id, w, len(w) AS n,
      |        CASE WHEN len(w) <= 40 THEN 1
      |             ELSE CAST(CEIL((len(w) - 40) / 30.0) AS BIGINT) + 1
      |        END AS nc
      |      FROM t),
      |e AS (SELECT doc_id, w, n,
      |        unnest(generate_series(0, nc - 1)) AS c FROM d),
      |f AS (SELECT doc_id, c AS chunk_seq,
      |        LEAST(c * 30, GREATEST(n - 40, 0)) AS start, n, w
      |      FROM e)
      |SELECT doc_id, chunk_seq, start,
      |  LEAST(40, n - start) AS n_tok,
      |  md5(array_to_string(
      |    list_slice(w, start + 1, start + LEAST(40, n - start)), ' ')) AS chunk_md5
      |FROM f ORDER BY doc_id, chunk_seq""".stripMargin

  /** Deterministic training-order shuffle: dense seeded-hash global
    * rank via the scale-safe two-level form ([[Corpus.shuffleOrder]] —
    * per-bucket windows + broadcast bucket offsets); the oracle is the
    * single global row_number the two-level rank must reproduce
    * exactly. */
  def qShuffleOrder(s: SparkSession, dir: String): DataFrame =
    Corpus.shuffleOrder(Tables.documents(s, dir).select(col("doc_id")),
        idCol = "doc_id", seed = "r10", buckets = 64)
      .orderBy(col("rank"))

  val qShuffleOrderSql: String =
    """SELECT row_number() OVER (ORDER BY
      |    try_cast('0x' ||
      |      substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle:r10'), 1, 15)
      |      AS BIGINT),
      |    doc_id) AS rank, doc_id
      |FROM documents ORDER BY rank""".stripMargin

  /** KMV distinct-count sketch: per source, estimate the distinct
    * 3-shingle cardinality from the 256 smallest shingle hashes
    * ([[Sketches.kmv]]) next to the exact count — the
    * cardinality-estimation pass a 100 TB dedup plan runs before
    * committing to the exact operators' shuffles. Every step (md5
    * hash60, k-th order statistic, the (k-1)*2^60/h_k division,
    * floor) is deterministic, so the ESTIMATE itself is
    * oracle-replayable — the reason KMV is here and HLL is not. */
  /** Shared shingle-hash staging for the sketch family — the "tokenize
    * once, sketch many" shape a real profiling pipeline runs:
    * q_distinct_kmv, q_distinct_hll and q_kmv_overlap all consume the
    * SAME (source, hash60(3-shingle)) stream, so it is computed once
    * per (session, sfDir), persisted MEMORY_AND_DISK, and reused —
    * previously each query re-exploded and re-hashed the full text
    * column (the r13 verdict's "What's wrong #2"). md5-hash60 over
    * shingle STRINGS (not the xx64 shingleHashes kernel): the
    * sketches' whole point is an oracle-replayable estimate, so the
    * hash must be the replayable one. Staged through the
    * session-scoped [[graft.Staging]] registry (evictable, dropped on
    * session end — the round-15 lifecycle hygiene) so Verify/Bench
    * driving many queries through one session pay the tokenize+hash
    * scan once; at 100 TB this staging is a persisted table, not a
    * cache. */
  private[queries] def shingleHashStream(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"sketch:shingles:$dir") {
      // NativeText.spanHashes == md5Hash60 of each space-joined 3-word
      // window, digest-streamed in ONE codegen'd pass (its scaladoc
      // pins byte-equality with TextDedup.hash60's SQL form) — the
      // prior shape exploded interpreted shingle STRINGS and md5'd
      // them post-explode. spanHashes is positional where shingles()
      // was per-doc-distinct: every consumer is a min/max-based sketch
      // or a (source, h) DISTINCT, so duplicate window rows are
      // value-neutral (KmvAgg's TreeSet, HLL register max), and the
      // oracles' DISTINCT replays are untouched.
      Tables.documents(s, dir).select(col("source"),
        explode(graft.functions.NativeText.spanHashes(
          split(col("text"), " "), 3)).as("h"))
    }

  def qDistinctKmv(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleHashStream(s, dir)
    val exact = sh.select("source", "h").distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    Sketches.kmv(sh, Seq("source"), "h", k = 256)
      .select(col("source"), Sketches.estimate(col("kmv"), 256).as("n_est"))
      .join(exact, "source")
      .select(col("source"), col("n_exact"), col("n_est"))
      .orderBy(col("source"))
  }

  val qDistinctKmvSql: String =
    """WITH d AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT source,
      |    try_cast('0x' || substr(md5(array_to_string(w[i+1:i+3], ' ')), 1, 15)
      |      AS BIGINT) AS h
      |  FROM d, unnest(range(len(w) - 2)) AS t(i)),
      |r AS (SELECT source, h,
      |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n_exact
      |  FROM sh),
      |tot AS (SELECT source, MAX(n_exact) AS n_exact FROM r GROUP BY source),
      |kth AS (SELECT source, h AS hk FROM r WHERE rn = 256)
      |SELECT tot.source, n_exact,
      |  COALESCE(CAST(FLOOR(255.0 * 1152921504606846976.0
      |      / CAST(hk AS DOUBLE)) AS BIGINT), n_exact) AS n_est
      |FROM tot LEFT JOIN kth ON tot.source = kth.source
      |ORDER BY tot.source""".stripMargin

  /** Bottom-k quantile sketch ([[Sketches.quantileSketch]]): per
    * source, p50/p90 of `n_chars` read off the 64-document bottom-k
    * hash sample — the mergeable-summary quantile pass, next to its
    * exact counterpart q_length_quantiles the way q_distinct_kmv sits
    * next to its exact count. Deterministic sample (md5 hash order) +
    * type-1 index rule ⇒ the estimate replays bit-for-bit in SQL. */
  def qQuantileSketch(s: SparkSession, dir: String): DataFrame =
    Sketches.quantileSketch(Tables.documents(s, dir),
        "source", "n_chars", "doc_id", k = 64,
        qs = Seq("p50_est" -> 0.5, "p90_est" -> 0.9))
      .orderBy(col("source"))

  val qQuantileSketchSql: String =
    """WITH r AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |        AS BIGINT),
      |      doc_id) AS rn
      |  FROM documents),
      |a AS (
      |  SELECT source,
      |    array_agg(n_chars ORDER BY n_chars) AS vals,
      |    COUNT(*) AS n_sample
      |  FROM r WHERE rn <= 64 GROUP BY source)
      |SELECT source, n_sample,
      |  CAST(vals[CAST(FLOOR((n_sample - 1) * 0.5) AS INT) + 1] AS BIGINT)
      |    AS p50_est,
      |  CAST(vals[CAST(FLOOR((n_sample - 1) * 0.9) AS INT) + 1] AS BIGINT)
      |    AS p90_est
      |FROM a ORDER BY source""".stripMargin

  /** HyperLogLog distinct-count sketch next to q_distinct_kmv's KMV:
    * per source, estimate the distinct 3-shingle cardinality from 256
    * one-byte registers ([[Sketches.hll]]) beside the exact count. No
    * pre-distinct anywhere — duplicate shingles are absorbed by the
    * register max, which is HLL's whole trade vs KMV (constant memory
    * and idempotent merge for ~2× estimator error at equal register
    * count). Every step — md5 hash60, integer bucket/rho splits,
    * `bin()` bit lengths, an exact BIGINT register sum, ONE double
    * division — replays bit-for-bit in the oracle, the determinism
    * the engine-private approx_count_distinct (HLL++) can't offer. */
  def qDistinctHll(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleHashStream(s, dir)
    // sketch and exact truth in ONE pass over the shingle stream
    // (Spark plans the mixed distinct/sketch aggregation as a single
    // two-phase job — the shingle explode is not paid twice)
    sh.groupBy(col("source"))
      .agg(countDistinct(col("h")).as("n_exact"),
        graft.functions.HyperLogLog.hllSketch(col("h"), 256).as("_hll"))
      .select(col("source"), col("n_exact"),
        Sketches.hllEstimate(col("_hll"), 256).as("n_hll"))
      .orderBy(col("source"))
  }

  val qDistinctHllSql: String =
    s"""WITH d AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT source,
      |    try_cast('0x' || substr(md5(array_to_string(w[i+1:i+3], ' ')), 1, 15)
      |      AS BIGINT) AS h
      |  FROM d, unnest(range(len(w) - 2)) AS t(i)),
      |b AS (SELECT source, h // 4503599627370496 AS bucket,
      |    h % 4503599627370496 AS wr FROM sh),
      |reg AS (SELECT source, bucket,
      |    MAX(CASE WHEN wr = 0 THEN 53 ELSE 53 - length(bin(wr)) END) AS rho
      |  FROM b GROUP BY source, bucket),
      |srcs AS (SELECT DISTINCT source FROM sh),
      |grid AS (SELECT srcs.source, r AS bucket
      |  FROM srcs, unnest(range(256)) AS u(r)),
      |z AS (SELECT grid.source,
      |    CAST(SUM(CAST(power(2, 53 - coalesce(reg.rho, 0)) AS BIGINT))
      |      AS BIGINT) AS zint
      |  FROM grid LEFT JOIN reg
      |    ON grid.source = reg.source AND grid.bucket = reg.bucket
      |  GROUP BY grid.source),
      |ex AS (SELECT source, count(*) AS n_exact FROM sh GROUP BY source)
      |SELECT ex.source, n_exact,
      |  CAST(FLOOR(${Sketches.hllConstant(256)} / CAST(zint AS DOUBLE))
      |    AS BIGINT) AS n_hll
      |FROM ex JOIN z ON ex.source = z.source
      |ORDER BY ex.source""".stripMargin

  /** Pairwise cross-source overlap estimation off KMV sketches
    * ([[Sketches.kmvOverlap]] — the Theta-sketch set-operation move):
    * every source pair's estimated distinct-shingle union and
    * intersection from one sketch pass + a groups-sized pair join.
    * "How much does domain A duplicate domain B" across a 100 TB
    * corpus without ever joining data to data — the pair join touches
    * G² k-arrays where G is the number of sources (a dimension), and
    * the estimates are integer-exact replays. */
  def qKmvOverlap(s: SparkSession, dir: String): DataFrame =
    Sketches.kmvOverlap(shingleHashStream(s, dir), "source", "h", k = 256)
      .orderBy(col("source_a"), col("source_b"))

  val qKmvOverlapSql: String =
    """WITH d AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT source,
      |    try_cast('0x' || substr(md5(array_to_string(w[i+1:i+3], ' ')), 1, 15)
      |      AS BIGINT) AS h
      |  FROM d, unnest(range(len(w) - 2)) AS t(i)),
      |r AS (SELECT source, h,
      |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
      |  FROM sh),
      |sk AS (SELECT source, array_agg(h ORDER BY h) AS kmv
      |  FROM r WHERE rn <= 256 GROUP BY source),
      |p AS (SELECT a.source AS source_a, b.source AS source_b,
      |    a.kmv AS ka, b.kmv AS kb
      |  FROM sk a JOIN sk b ON a.source < b.source),
      |m AS (SELECT source_a, source_b, ka, kb,
      |    list_sort(list_distinct(ka || kb))[1:256] AS mg FROM p),
      |c AS (SELECT source_a, source_b, mg,
      |    len(list_filter(mg,
      |      x -> list_contains(ka, x) AND list_contains(kb, x))) AS common
      |  FROM m),
      |u AS (SELECT source_a, source_b, common, len(mg) AS msz,
      |    CASE WHEN len(mg) < 256 THEN CAST(len(mg) AS BIGINT)
      |         ELSE CAST(FLOOR(255.0 * 1152921504606846976.0
      |                 / CAST(mg[256] AS DOUBLE)) AS BIGINT) END AS est_union
      |  FROM c)
      |SELECT source_a, source_b, CAST(common AS BIGINT) AS common, est_union,
      |  CAST(FLOOR(CAST(common AS DOUBLE) * CAST(est_union AS DOUBLE)
      |    / CAST(msz AS DOUBLE)) AS BIGINT) AS est_inter
      |FROM u ORDER BY source_a, source_b""".stripMargin

  /** Count-Min point-frequency estimates for the exact top-20 words
    * next to their true counts — the two frequency summaries composed:
    * the probe set is [[Sketches.heavyHitters]]' Misra-Gries two-pass
    * top-k (exact, bounded state), the estimates come from a 4×256
    * [[Sketches.countMinSketch]] counter matrix built in ONE pass with
    * nothing but 8 KB of longs per task crossing the wire. At the
    * gate's vocabulary (≫ 256 buckets) collisions are real, so
    * cnt_est ≥ cnt_true with deterministic integer overshoot the
    * oracle replays by grouping the same md5 buckets. */
  def qCountMin(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
    val probes = Sketches.heavyHitters(words, "word", k = 20, capacity = 512)
    val sketch = Sketches.countMinSketch(words, "word", depth = 4, width = 256)
    Sketches.countMinQuery(sketch, probes, "word", depth = 4, width = 256)
      .join(probes, "word")
      .select(col("word"), col("cnt").as("cnt_true"), col("cnt_est"))
      .orderBy(col("cnt_true").desc, col("word"))
  }

  val qCountMinSql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |tot AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
      |probes AS (SELECT word, cnt FROM tot ORDER BY cnt DESC, word LIMIT 20),
      |rows_ AS (SELECT i FROM unnest(range(4)) AS t(i)),
      |cm AS (SELECT rows_.i,
      |    try_cast('0x' || substr(md5(tot.word || ':cm' || rows_.i), 1, 15)
      |      AS BIGINT) % 256 AS bucket,
      |    SUM(tot.cnt) AS c
      |  FROM tot, rows_ GROUP BY rows_.i, bucket),
      |pb AS (SELECT probes.word, probes.cnt, rows_.i,
      |    try_cast('0x' || substr(md5(probes.word || ':cm' || rows_.i), 1, 15)
      |      AS BIGINT) % 256 AS bucket
      |  FROM probes, rows_)
      |SELECT pb.word, CAST(MAX(pb.cnt) AS BIGINT) AS cnt_true,
      |  CAST(MIN(cm.c) AS BIGINT) AS cnt_est
      |FROM pb JOIN cm ON pb.i = cm.i AND pb.bucket = cm.bucket
      |GROUP BY pb.word
      |ORDER BY cnt_true DESC, word""".stripMargin

  /** Per-domain length anomaly detection in EXACT integer arithmetic
    * ([[Corpus.integerOutliers]], z = 2): the |x−μ| > 2σ flag
    * algebraized to BIGINT products so the flag is order-independent
    * and replays without a floating mean/stddev. One groups-sized
    * aggregation joined back to the scan. */
  def qOutliers(s: SparkSession, dir: String): DataFrame =
    Corpus.integerOutliers(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "n_chars", z = 2)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val qOutliersSql: String =
    """WITH st AS (SELECT source, count(*) AS n, sum(n_chars) AS s,
      |    sum(n_chars * n_chars) AS q
      |  FROM documents GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars
      |FROM documents d JOIN st USING (source)
      |WHERE (d.n_chars * st.n - st.s) * (d.n_chars * st.n - st.s)
      |    > 4 * (st.n * st.q - st.s * st.s)
      |ORDER BY d.doc_id""".stripMargin

  /** Class-balanced Bernoulli downsampling by language
    * ([[Corpus.balancedSample]]): every language kept at the smallest
    * language's expected size via a per-group deterministic
    * content-hash coin — single scan, no heap state, the
    * streaming-compatible twin of q_sample_quota's exact top-k. The
    * kept row SET is a pure function of the data, replayed by the
    * oracle threshold-for-threshold. */
  def qSampleBalanced(s: SparkSession, dir: String): DataFrame =
    Corpus.balancedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          col("source")),
        "lang", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  val qSampleBalancedSql: String =
    """WITH g AS (SELECT lang, count(*) AS gn FROM documents GROUP BY lang),
      |t AS (SELECT min(gn) AS tmin FROM g)
      |SELECT d.doc_id, d.lang, d.source
      |FROM documents d JOIN g USING (lang) CROSS JOIN t
      |WHERE try_cast('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
      |    AS BIGINT)
      |  < CAST(FLOOR(CAST(tmin AS DOUBLE) / CAST(gn AS DOUBLE)
      |      * 1152921504606846976.0) AS BIGINT)
      |ORDER BY d.doc_id""".stripMargin

  /** Top-3 characteristic terms per document by TF-IDF
    * ([[graft.operators.Search.tfidfTopTerms]]): tf·ln(N/df) rounded
    * to 6 decimals BEFORE ranking (both engines rank identical
    * rounded scores; in-doc ties break by term), per-doc top-k on the
    * custom heap operator — one clustered exchange, no
    * vocabulary-sized sorts. */
  def qTfidf(s: SparkSession, dir: String): DataFrame =
    graft.operators.Search.tfidfTopTerms(
        Tables.documents(s, dir), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rank"))

  val qTfidfSql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |  GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |nd AS (SELECT count(*) AS n FROM documents),
      |sc AS (SELECT tf.doc_id, tf.term,
      |    round(CAST(tf.tf AS DOUBLE)
      |      * ln(CAST(nd.n AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS score6
      |  FROM tf JOIN df USING (term) CROSS JOIN nd),
      |r AS (SELECT doc_id, term, score6,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score6 DESC, term) AS INT) AS rank
      |  FROM sc)
      |SELECT doc_id, rank, term, score6 FROM r WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  def qLangId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("_w"))
      .select(col("doc_id"),
        // sorted: kernel tie-breaking is first-profile-wins and must
        // match the oracle's alphabetical CASE chain on tied scores
        graft.functions.NativeTextStats.langId(col("_w"),
          TextStats.stopwordProfiles.toSeq.sortBy(_._1)).as("lang_pred"))
      .orderBy(col("doc_id"))

  /** Shared lang-ID SQL: per-language stopword-hit score columns over a
    * `w` word-list CTE named `t`, and the alphabetical-first-wins argmax
    * CASE — ONE builder for every oracle that replays the langId kernel
    * (the kernel receives the same alphabetically-sorted profiles, so
    * tie-breaking agrees by construction). */
  private[queries] def langScoreColsSql: String = {
    val profiles = TextStats.stopwordProfiles.toSeq.sortBy(_._1)
    profiles.map { case (lang, ws) =>
      val in = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(list_sum(list_transform(w, x -> CASE WHEN lower(x) IN ($in) THEN 1 ELSE 0 END)) AS BIGINT) AS s_$lang"
    }.mkString(",\n  ")
  }
  private[queries] def langArgmaxSql: String = {
    val langs = TextStats.stopwordProfiles.keys.toSeq.sorted
    val caseChain = langs.init.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("\n    ")
    s"""CASE WHEN ${langs.map(l => s"s_$l").mkString(" + ")} = 0 OR
       |            greatest(${langs.map(l => s"s_$l").mkString(", ")}) = 0 THEN 'und'
       |    $caseChain
       |    ELSE '${langs.last}' END""".stripMargin
  }

  val qLangIdSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sc AS (SELECT doc_id,
       |  $langScoreColsSql
       |  FROM t)
       |SELECT doc_id,
       |  $langArgmaxSql AS lang_pred
       |FROM sc ORDER BY doc_id""".stripMargin

  // --- similarity search ------------------------------------------------

  private def queriesDf(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))

  private def embCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))

  // --- staged ANN family prefixes (graft.Staging, the pipeline/sketch
  // discipline): the brute-force truth, the IVF inverted-list
  // assignment and the projected rerank are each consumed by 2–4
  // gates (topk/recall/scoreboard; ivf/ivf_probe/recall/scoreboard;
  // proj/scoreboard) — at 100 TB each IS a stored index/eval table,
  // here each stages once per (session, dir).

  /** Exact top-5 per probe, staged; top-k for k ≤ 5 is rank ≤ k of
    * the same ordering, so every consumer filters instead of
    * rescanning the corpus. */
  private def truth5Staged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"ann:truth5:$dir") {
      Similarity.bruteForceTopK(embCorpus(s, dir), queriesDf(s, dir), k = 5)
    }

  /** The IVF (nid, e, cell) assignment against the %-sampled
    * centroids — the stored inverted-list index. */
  private def ivfAssignedStaged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"ann:assigned:$dir") {
      Similarity.ivfAssign(embCorpus(s, dir),
          embCorpus(s, dir).toDF("cid", "c")
            .where(col("cid") % CentroidMod === 0))
        .toDF("nid", "e", "cell")
    }

  private def ivfCentroids(s: SparkSession, dir: String): DataFrame =
    embCorpus(s, dir).toDF("cid", "c").where(col("cid") % CentroidMod === 0)

  /** Two-stage projected rerank top-5, staged; the k=3 consumer
    * filters rank ≤ 3 (same rerank ordering). */
  private def projRerank5Staged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"ann:proj5:$dir") {
      Similarity.projectedRerankTopK(embCorpus(s, dir), queriesDf(s, dir),
        k = 5, m = 20, dim = 64, outDim = 16, seed = "rp15")
    }

  /** Exact top-5 cosine neighbors for 10 probe vectors — the
    * brute-force baseline (broadcast probes, no corpus shuffle). */
  def qAnnTopk(s: SparkSession, dir: String): DataFrame =
    truth5Staged(s, dir)
      .orderBy(col("qid"), col("rank"))

  val qAnnTopkSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |s AS (SELECT qid, e.vec_id AS nid,
      |        list_inner_product(qe, e.embedding::DOUBLE[]) /
      |        (sqrt(list_inner_product(qe, qe)) *
      |         sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS sim
      |      FROM q, embeddings e WHERE e.vec_id != qid),
      |r AS (SELECT qid, nid,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
      |      FROM s)
      |SELECT qid, nid, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Hard-negative mining under the gate
    * ([[graft.operators.Similarity.hardNegatives]]): top-5 off-label
    * near-misses per anchor with the 0.95 duplicate guard — the
    * contrastive-training curation step over the labeled embedding
    * corpus. The oracle replays scoring, both filters, and the
    * (sim desc, nid) rank; the engine side runs the TopKPerGroup heap
    * against the broadcast anchors, no corpus shuffle. */
  def qHardNegatives(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.hardNegatives(
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"), col("label")),
        Tables.embeddings(s, dir).filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding"), col("label")),
        k = 5, dupCos = 0.95)
      .orderBy(col("qid"), col("rank"))

  val qHardNegativesSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS ql
      |           FROM embeddings WHERE vec_id < 10),
      |s AS (SELECT qid, e.vec_id AS nid,
      |        list_inner_product(qe, e.embedding::DOUBLE[]) /
      |        (sqrt(list_inner_product(qe, qe)) *
      |         sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS sim
      |      FROM q, embeddings e WHERE e.vec_id != qid AND e.label != ql),
      |f AS (SELECT qid, nid, sim FROM s WHERE sim < 0.95),
      |r AS (SELECT qid, nid,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
      |      FROM f)
      |SELECT qid, nid, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Content-defined chunking under the gate ([[Corpus.cdcChunks]],
    * k = 3, divisor = 32): every document's shift-resistant chunk
    * table in 1-based word coordinates. The oracle replays the window
    * hashes, the mod-divisor boundary rule, the tail close, and the
    * lag reconstruction. */
  def qCdcChunks(s: SparkSession, dir: String): DataFrame =
    Corpus.cdcChunks(Tables.documents(s, dir), "doc_id", "text",
        k = 3, divisor = 32)
      .orderBy(col("doc_id"), col("chunk_ix"))

  val qCdcChunksSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(range(len(w) - 2)) AS pos, w FROM d),
      |s AS (SELECT doc_id, pos,
      |        try_cast('0x'||substr(md5(
      |          w[pos+1]||' '||w[pos+2]||' '||w[pos+3]),1,15) AS BIGINT) AS h
      |      FROM g),
      |bd AS (SELECT doc_id, pos + 3 AS e FROM s WHERE h % 32 = 0),
      |ends AS (SELECT DISTINCT doc_id, e FROM (
      |  SELECT doc_id, e FROM bd
      |  UNION ALL SELECT doc_id, len(w) AS e FROM d)),
      |r AS (SELECT doc_id, e,
      |        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY e)
      |          AS INT) AS chunk_ix,
      |        coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1
      |          AS start_word
      |      FROM ends)
      |SELECT doc_id, chunk_ix, start_word, e AS end_word,
      |  e - start_word + 1 AS n_words
      |FROM r ORDER BY doc_id, chunk_ix""".stripMargin

  /** Held-out perplexity under the gate ([[Corpus.knScoreForeign]]):
    * the bigram KN model trains on the doc_id % 5 ≠ 0 split and scores
    * the HELD-OUT fifth — the honest LM-quality measurement, with the
    * full backoff chain live (seen bigram / seen-context-only / unseen
    * context / unseen continuation at the 0.5/B floor) and the OOV
    * count surfaced per document. */
  def qKnHeldout(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    Corpus.knScoreForeign(docs.where(col("doc_id") % 5 === 0), "doc_id", "w",
        Corpus.knCounts(docs.where(col("doc_id") % 5 =!= 0), "doc_id", "w"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        col("avg_logprob"), round(col("ppl"), 3).as("ppl"))
      .orderBy(col("doc_id"))
  }

  val qKnHeldoutSql: String = {
    val pcont = "((CASE WHEN nb IS NULL THEN 0.5 ELSE CAST(nb AS DOUBLE) END)" +
      " / CAST(bt AS DOUBLE))"
    val d = knDiscountSql
    val p = s"""CASE
       |      WHEN cb IS NOT NULL THEN
       |        (CAST(cb AS DOUBLE) - $d + $d * CAST(nf AS DOUBLE) * $pcont)
       |          / CAST(c1 AS DOUBLE)
       |      WHEN c1 IS NOT NULL THEN
       |        $d * CAST(nf AS DOUBLE) * $pcont / CAST(c1 AS DOUBLE)
       |      ELSE $pcont END""".stripMargin
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |b AS MATERIALIZED (
       |      SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
       |      FROM (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM d)),
       |trn AS MATERIALIZED (
       |      SELECT w1, w2, count(*) AS cb FROM b
       |      WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
       |ctx AS (SELECT w1, sum(cb) AS c1, count(*) AS nf FROM trn GROUP BY 1),
       |rts AS (SELECT w2, count(*) AS nb FROM trn GROUP BY 1),
       |s AS (SELECT count(*) AS bt,
       |        sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS n1,
       |        sum(CASE WHEN cb = 2 THEN 1 ELSE 0 END) AS n2 FROM trn),
       |lp AS (SELECT b.doc_id, ln($p) AS l,
       |        CASE WHEN cb IS NULL THEN 1 ELSE 0 END AS oov
       |       FROM b LEFT JOIN trn USING (w1, w2) LEFT JOIN ctx USING (w1)
       |       LEFT JOIN rts USING (w2) CROSS JOIN s
       |       WHERE b.doc_id % 5 = 0)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(oov) AS BIGINT) AS n_oov,
       |  round(sum(l) / count(*), 6) AS avg_logprob,
       |  round(round(exp(-(sum(l) / count(*))), 6), 3) AS ppl
       |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Likelihood-gain pruning under the gate ([[Corpus.kn3PruneGains]]
    * — the Stolcke-pruning KL term, count-weighted): the trigrams
    * worth SHIPPING, gain ≥ 1 nat of training-corpus likelihood over
    * their bigram backoff. The oracle replays both interpolation
    * levels and the weighted log-ratio. */
  def qKnPrune(s: SparkSession, dir: String): DataFrame =
    Corpus.kn3PruneGainsFromJoined(kn3JoinedStaged(s, dir))
      .where(col("gain") >= 1.0)
      .orderBy(col("w1"), col("w2"), col("w3"))

  val qKnPruneSql: String =
    s"""WITH $kn3Ctes
       |SELECT w1, w2, w3, c3,
       |  round(CAST(c3 AS DOUBLE) * (ln($kn3TermSql) - ln($kn3P2Sql)), 6)
       |    AS gain
       |FROM c JOIN x12 USING (w1, w2) JOIN b USING (w2, w3)
       |JOIN x2 USING (w2) JOIN nb USING (w3) CROSS JOIN s
       |WHERE round(CAST(c3 AS DOUBLE) * (ln($kn3TermSql) - ln($kn3P2Sql)), 6)
       |  >= 1.0
       |ORDER BY w1, w2, w3""".stripMargin

  /** Margin-based bitext mining under the gate
    * ([[graft.operators.Similarity.bitextMine]]): even-label anchors
    * (vec_id < 200) mined against the odd-label corpus — mutual best
    * by the distance margin over k = 4 NN averages, threshold 0.05
    * (48 of 87 mutual-best pairs clear it at sf0.01 — the threshold
    * discriminates, the gate is not vacuous). The oracle replays
    * scoring, both k-NN directions, the round-6 margins, and the
    * mutual-best join. */
  def qBitextMine(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.bitextMine(
        Tables.embeddings(s, dir)
          .filter(col("label") % 2 === 0 && col("vec_id") < 200)
          .select(col("vec_id"), col("embedding")),
        Tables.embeddings(s, dir).filter(col("label") % 2 === 1)
          .select(col("vec_id"), col("embedding")),
        k = 4, threshold = 0.05)
      .orderBy(col("xid"))

  val qBitextMineSql: String =
    """WITH xs AS (SELECT vec_id AS xid, embedding::DOUBLE[] AS xe
      |            FROM embeddings WHERE label % 2 = 0 AND vec_id < 200),
      |ys AS (SELECT vec_id AS yid, embedding::DOUBLE[] AS ye
      |       FROM embeddings WHERE label % 2 = 1),
      |sims AS MATERIALIZED (
      |  SELECT xid, yid,
      |    list_inner_product(xe, ye) /
      |    (sqrt(list_inner_product(xe, xe)) *
      |     sqrt(list_inner_product(ye, ye))) AS sim
      |  FROM xs, ys),
      |kx AS (SELECT xid, yid, sim, row_number() OVER (PARTITION BY xid
      |         ORDER BY sim DESC, yid) AS r FROM sims),
      |ky AS (SELECT xid, yid, sim, row_number() OVER (PARTITION BY yid
      |         ORDER BY sim DESC, xid) AS r FROM sims),
      |ax AS (SELECT xid, avg(sim) AS ax FROM kx WHERE r <= 4 GROUP BY 1),
      |ay AS (SELECT yid, avg(sim) AS ay FROM ky WHERE r <= 4 GROUP BY 1),
      |cand AS (SELECT DISTINCT xid, yid, sim FROM (
      |  SELECT xid, yid, sim FROM kx WHERE r <= 4
      |  UNION ALL SELECT xid, yid, sim FROM ky WHERE r <= 4)),
      |m AS (SELECT xid, yid,
      |    round(sim - (ax + ay) / 2.0, 6) AS margin
      |  FROM cand JOIN ax USING (xid) JOIN ay USING (yid)),
      |bx AS (SELECT xid, yid, margin, row_number() OVER (PARTITION BY xid
      |         ORDER BY margin DESC, yid) AS r FROM m),
      |byy AS (SELECT xid, yid, row_number() OVER (PARTITION BY yid
      |         ORDER BY margin DESC, xid) AS r FROM m)
      |SELECT b1.xid, b1.yid, b1.margin
      |FROM (SELECT xid, yid, margin FROM bx WHERE r = 1) b1
      |JOIN (SELECT xid, yid FROM byy WHERE r = 1) b2 USING (xid, yid)
      |WHERE b1.margin >= 0.05 ORDER BY xid""".stripMargin

  /** Johnson–Lindenstrauss sign projection under the gate
    * ([[Similarity.randomProject]]): every embedding compressed 64→16
    * against the seeded md5-derived ±1 matrix, all 16 coordinates of
    * every vector oracle-checked — the pre-ANN compression pass, one
    * codegen'd scan, zero shuffle. √16 = 4 is IEEE-exact on both
    * engines, and the dot kernel's left-to-right double fold matches
    * list_inner_product, so the comparison is exact after round-6. */
  def qRandomProj(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.randomProject(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dim = 64, outDim = 16, seed = "rp15")
      .orderBy(col("vec_id"), col("j"))

  val qRandomProjSql: String =
    """WITH r AS (SELECT j, list(CASE WHEN try_cast('0x' ||
      |      substr(md5('rp15:' || i || ':' || j), 1, 15) AS BIGINT) % 2 = 0
      |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS sgn
      |    FROM unnest(range(16)) AS tj(j), unnest(range(64)) AS ti(i)
      |    GROUP BY j),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings)
      |SELECT vec_id, j,
      |  round(list_inner_product(x, sgn) / sqrt(16.0), 6) + 0.0 AS v
      |FROM e, r
      |ORDER BY vec_id, j""".stripMargin

  /** Two-stage retrieval under the gate
    * ([[Similarity.projectedRerankTopK]]): shortlist of 20 by cosine
    * in the 16-dim JL-projected space, exact 64-dim cosine re-rank to
    * top-5 — the compression composition a corpus-scale ANN deploys
    * (projected comparisons are 4× cheaper; the exact kernel touches
    * only shortlists). The oracle replays projection, shortlist and
    * re-rank verbatim, so the gate hash-checks the full two-stage
    * algorithm; recall vs exact top-k is spec-measured. */
  def qAnnProj(s: SparkSession, dir: String): DataFrame =
    projRerank5Staged(s, dir)
      .orderBy(col("qid"), col("rank"))

  val qAnnProjSql: String =
    """WITH r AS (SELECT j, list(CASE WHEN try_cast('0x' ||
      |      substr(md5('rp15:' || i || ':' || j), 1, 15) AS BIGINT) % 2 = 0
      |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS sgn
      |    FROM unnest(range(16)) AS tj(j), unnest(range(64)) AS ti(i)
      |    GROUP BY j),
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
      |p AS (SELECT e.vec_id,
      |        list(round(list_inner_product(e.x, r.sgn) / sqrt(16.0), 6) + 0.0
      |          ORDER BY r.j) AS px
      |      FROM e, r GROUP BY e.vec_id),
      |pq AS (SELECT vec_id AS qid, px AS qpx FROM p WHERE vec_id < 10),
      |s1 AS (SELECT qid, p.vec_id AS nid,
      |        list_inner_product(qpx, p.px) /
      |        (sqrt(list_inner_product(qpx, qpx)) *
      |         sqrt(list_inner_product(p.px, p.px))) AS sim
      |      FROM pq, p WHERE p.vec_id != qid),
      |short AS (SELECT qid, nid FROM (
      |        SELECT qid, nid, row_number() OVER (PARTITION BY qid
      |          ORDER BY sim DESC, nid) AS rk FROM s1) WHERE rk <= 20),
      |qe AS (SELECT vec_id AS qid, x AS qx FROM e WHERE vec_id < 10),
      |s2 AS (SELECT short.qid, short.nid,
      |        list_inner_product(qx, e.x) /
      |        (sqrt(list_inner_product(qx, qx)) *
      |         sqrt(list_inner_product(e.x, e.x))) AS sim
      |      FROM short JOIN e ON e.vec_id = short.nid
      |        JOIN qe ON qe.qid = short.qid),
      |rr AS (SELECT qid, nid,
      |        CAST(row_number() OVER (PARTITION BY qid
      |          ORDER BY sim DESC, nid) AS INT) AS rank FROM s2)
      |SELECT qid, nid, rank FROM rr WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  private val NumPlanes = 6
  private val Dim = 64
  private val CentroidMod = 29

  /** IVF-bucketed top-3: deterministic sampled centroids, nearest-cell
    * quantization, per-cell inverted-list search (nprobe=1). The oracle
    * replays the identical quantizer: same |c|²−2x·c scores, same
    * (score, cid) tie order — double arithmetic is sequential-fold
    * bit-identical on both engines. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir),
        queriesDf(s, dir), k = 3, ivfCentroids(s, dir), nprobe = 1)
      .orderBy(col("qid"), col("rank"))

  val qAnnIvfSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |scored AS (
       |  SELECT v.vec_id AS vid, v.e, cent.cid,
       |    list_inner_product(c, c) - 2.0 * list_inner_product(v.e, c) AS score
       |  FROM v, cent),
       |assigned AS (
       |  SELECT vid, e, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |q AS (SELECT vid AS qid, e AS qv, cell FROM assigned WHERE vid < 10),
       |s AS (
       |  SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM q JOIN assigned a USING (cell) WHERE a.vid != qid),
       |r AS (SELECT qid, nid,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
       |      FROM s)
       |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** IVF with nprobe=2 — the recall knob: each query searches its two
    * nearest inverted lists. Corpus vectors live in exactly one cell,
    * so probe cells contribute disjoint neighbors; the oracle replays
    * the probe expansion with rn <= 2. */
  def qAnnIvfProbe(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir),
        queriesDf(s, dir), k = 3, ivfCentroids(s, dir), nprobe = 2)
      .orderBy(col("qid"), col("rank"))

  val qAnnIvfProbeSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |scored AS (
       |  SELECT v.vec_id AS vid, v.e, cent.cid,
       |    list_inner_product(c, c) - 2.0 * list_inner_product(v.e, c) AS score
       |  FROM v, cent),
       |assigned AS (
       |  SELECT vid, e, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |probes AS (
       |  SELECT vid AS qid, e AS qv, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored WHERE vid < 10) WHERE rn <= 2),
       |s AS (
       |  SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM probes q JOIN assigned a USING (cell) WHERE a.vid != qid),
       |r AS (SELECT qid, nid,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
       |      FROM s)
       |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Two-level IVF top-3 (Similarity.ivf2TopK over the HIERARCHICAL
    * index): the same retrieval contract as q_ann_ivf, but the
    * inverted-list index is built by the coarse-then-fine quantizer —
    * per-vector build work is 2√k scores instead of k, which is the
    * variant that stays stressable at 100× when the centroid count
    * tracks the corpus (q_ann_ivf's flat build is the documented
    * k ∝ n exclusion). Probes are rows of the SAME assigned table
    * (vid < 10), so index and probes can never disagree about a
    * probe's cell. The oracle replays the shared twoLevelAssignCtes
    * chain, then the identical cell-scoped cosine top-3. */
  def qAnnIvf2(s: SparkSession, dir: String): DataFrame = {
    val assigned = graft.Staging.stage(s, s"ann:assigned2:$dir") {
      Similarity.ivfAssignHierarchical(embCorpus(s, dir),
        ivfCentroids(s, dir))
    }
    Similarity.ivf2TopK(assigned, col("vid") < 10, k = 3)
      .orderBy(col("qid"), col("rank"))
  }

  def qAnnIvf2Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |$twoLevelAssignCtes,
       |q AS (SELECT vid AS qid, e AS qv, cell FROM assigned WHERE vid < 10),
       |s AS (
       |  SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM q JOIN assigned a USING (cell) WHERE a.vid != qid),
       |r AS (SELECT qid, nid,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
       |      FROM s)
       |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Lloyd k-means, oracle-gated (the IVF index BUILD path promoted to
    * the driver gate — previously spec-only): two deterministic sweeps
    * from the sampled-centroid init, emitted as the exploded per-dim
    * centroid table (cid, pos, m). The oracle replays both sweeps with
    * the same assignment CTE the IVF queries use (|c|²−2x·c argmin,
    * (score, cid) tie order) and a per-dim AVG; per-pair dot products
    * fold sequentially (bit-identical on both engines, the q_ann_ivf
    * precedent), and the only cross-engine wobble — double-sum order
    * inside AVG across Spark partitions — is ~1 ulp, absorbed by the
    * round-to-6 emit (the q_dedup_embed precedent). Assignment argmin
    * is robust to that wobble: best-vs-runner-up score gaps are O(0.1),
    * fourteen orders above it. */
  /** The two-sweep Lloyd training, staged once per (session, dir) —
    * consumed by q_kmeans (emits the centroids) and q_ann_ivf_trained
    * (searches with them); staging also pins ONE realization of the
    * ~1-ulp AVG partition wobble for both consumers. */
  private def kmeans2Staged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"ann:kmeans2:$dir") {
      Similarity.kmeansCentroids(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        initMod = CentroidMod, iters = 2)
    }

  def qKmeans(s: SparkSession, dir: String): DataFrame =
    kmeans2Staged(s, dir)
      .select(col("cid"), posexplode(col("c")))
      .select(col("cid"), col("pos"), round(col("col"), 6).as("m"))
      .orderBy(col("cid"), col("pos"))

  /** The two-sweep Lloyd training chain shared by qKmeansSql (which
    * emits the centroids) and qAnnIvfTrainedSql (which searches with
    * them) — one definition so the replayed quantizer can never drift
    * from the gated training query. */
  private def kmeansTrainCtes(initWhere: String): String =
    s"""v AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS e FROM embeddings),
       |c0 AS (SELECT vid AS cid, e AS c FROM v WHERE $initWhere),
       |s1 AS (SELECT v.vid, v.e, c0.cid,
       |         list_inner_product(c, c) - 2.0 * list_inner_product(e, c) AS score
       |       FROM v, c0),
       |a1 AS (SELECT vid, e, cid AS cell FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |         FROM s1) WHERE rn = 1),
       |m1 AS (SELECT cell, pos, avg(e[pos + 1]) AS m
       |       FROM a1, range(0, $Dim) t(pos) GROUP BY cell, pos),
       |mc1 AS (SELECT cell AS cid, list(m ORDER BY pos) AS c FROM m1 GROUP BY cell),
       |c1 AS (SELECT c0.cid, coalesce(mc1.c, c0.c) AS c
       |       FROM c0 LEFT JOIN mc1 ON c0.cid = mc1.cid),
       |s2 AS (SELECT v.vid, v.e, c1.cid,
       |         list_inner_product(c, c) - 2.0 * list_inner_product(e, c) AS score
       |       FROM v, c1),
       |a2 AS (SELECT vid, e, cid AS cell FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |         FROM s2) WHERE rn = 1),
       |m2 AS (SELECT cell, pos, avg(e[pos + 1]) AS m
       |       FROM a2, range(0, $Dim) t(pos) GROUP BY cell, pos),
       |mc2 AS (SELECT cell AS cid, list(m ORDER BY pos) AS c FROM m2 GROUP BY cell),
       |c2 AS (SELECT c1.cid, coalesce(mc2.c, c1.c) AS c
       |       FROM c1 LEFT JOIN mc2 ON c1.cid = mc2.cid)""".stripMargin

  private val KmeansTrainCtes: String =
    kmeansTrainCtes(s"vid % $CentroidMod = 0")

  /** The fixed-k init band: present IDENTICALLY at every sf (vec_id
    * 0..499 exist at sf0.001/0.01/0.1 alike), so k = 18 regardless of
    * corpus size. */
  private val FixedKInitWhere = "vid < 500 AND vid % 29 = 0"

  val qKmeansSql: String =
    s"""WITH $KmeansTrainCtes
       |SELECT cid, CAST(pos AS INT) AS pos, round(c[pos + 1], 6) AS m
       |FROM c2, range(0, $Dim) t(pos)
       |ORDER BY cid, pos""".stripMargin

  /** Lloyd training with k FIXED by an explicit init id band (18
    * centroids) — the honest DATA-scaling measurement: [[qKmeans]]'s
    * `initMod` sampling makes k track the corpus, so its 10× reading
    * measures construction (centroids × data), not data; this gate
    * holds k constant across scales (the ScaleStress fixed-k
    * discipline, promoted to a driver gate). Same two sweeps, same
    * assignment/mean formulation, same round-6 emit; the oracle
    * replays both sweeps from the same fixed init. */
  def qKmeansFixedK(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    Similarity.kmeansFrom(corpus,
        corpus.where(col("vec_id") < 500L && col("vec_id") % 29 === 0),
        iters = 2)
      .select(col("cid"), posexplode(col("c")))
      // + 0.0 folds IEEE −0.0 into 0.0 on both engines (a near-zero
      // mean rounding to signed zero renders differently otherwise)
      .select(col("cid"), col("pos"),
        (round(col("col"), 6) + lit(0.0)).as("m"))
      .orderBy(col("cid"), col("pos"))
  }

  val qKmeansFixedKSql: String =
    s"""WITH ${kmeansTrainCtes(FixedKInitWhere)}
       |SELECT cid, CAST(pos AS INT) AS pos, round(c[pos + 1], 6) + 0.0 AS m
       |FROM c2, range(0, $Dim) t(pos)
       |ORDER BY cid, pos""".stripMargin

  /** IVF search against the TRAINED quantizer — the build→search loop
    * closed: [[qKmeans]]'s two-sweep Lloyd centroids (not a corpus
    * sample) assign both corpus and probes, then each probe searches
    * its inverted list. Centroids are rounded to 6 decimals on BOTH
    * engines before any scoring, so the quantizer the oracle replays
    * is bit-identical (the round-6 emit of q_kmeans, moved before the
    * search instead of after) and every downstream dot product folds
    * sequentially — the q_ann_ivf determinism argument, unchanged. */
  def qAnnIvfTrained(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = kmeans2Staged(s, dir)
      .select(col("cid"), transform(col("c"), x => round(x, 6)).as("c"))
    Similarity.ivfTopKWith(corpus, queriesDf(s, dir), k = 3, cents)
      .orderBy(col("qid"), col("rank"))
  }

  /** The trained-quantizer corpus assignment (round-6 centroids `cr`,
    * |c|²−2x·c scores `st`, argmin assignment `at`) — the replayed
    * chain shared by qAnnIvfTrainedSql and the cluster-balance gate,
    * one definition so the two can never drift. */
  private lazy val TrainedAssignCtes: String =
    s"""$KmeansTrainCtes,
       |cr AS (SELECT cid, list(round(c[pos + 1], 6) ORDER BY pos) AS c
       |       FROM c2, range(0, $Dim) t(pos) GROUP BY cid),
       |st AS (SELECT v.vid, v.e, cr.cid,
       |         list_inner_product(c, c) - 2.0 * list_inner_product(e, c) AS score
       |       FROM v, cr),
       |at AS (SELECT vid, e, cid AS cell FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |         FROM st) WHERE rn = 1)""".stripMargin

  val qAnnIvfTrainedSql: String =
    s"""WITH $TrainedAssignCtes,
       |q AS (SELECT vid AS qid, e AS qv, cell FROM at WHERE vid < 10),
       |s AS (SELECT qid, a.vid AS nid,
       |        list_inner_product(qv, a.e) /
       |        (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(a.e, a.e))) AS sim
       |      FROM q JOIN at a USING (cell) WHERE a.vid != qid),
       |r AS (SELECT qid, nid,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
       |      FROM s)
       |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Cluster-balanced subsampling under the gate — the topic-balance
    * pass of a curation pipeline (the cluster-proportional cousin of
    * SemDeDup's cluster prune): every embedding is assigned to its
    * TRAINED round-6 Lloyd centroid (the staged q_kmeans quantizer,
    * [[Similarity.ivfAssign]]'s broadcast argmin — the exact chain
    * q_ann_ivf_trained replays) and each cluster is Bernoulli-
    * downsampled to the smallest cluster's size with the
    * deterministic content-hash coin ([[Corpus.balancedSample]]).
    * Composition of two already-gated formulations; the oracle
    * reuses both gates' own CTE fragments verbatim. Plan: one
    * broadcast-argmin scan + a clusters-sized aggregate joined back
    * + a stateless filter — no per-cluster heap, no extra shuffle
    * beyond the argmin combine. */
  def qClusterBalance(s: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = kmeans2Staged(s, dir)
      .select(col("cid"), transform(col("c"), x => round(x, 6)).as("c"))
    val assigned = Similarity.ivfAssign(corpus, cents)
      .select(col("vid").as("vec_id"), col("cell"))
    Corpus.balancedSample(assigned, "cell", "vec_id")
      .orderBy(col("vec_id"))
  }

  val qClusterBalanceSql: String =
    s"""WITH $TrainedAssignCtes,
       |g AS (SELECT cell, count(*) AS gn FROM at GROUP BY cell),
       |t AS (SELECT min(gn) AS tmin FROM g)
       |SELECT at.vid AS vec_id, at.cell
       |FROM at JOIN g USING (cell) CROSS JOIN t
       |WHERE try_cast('0x' || substr(md5(CAST(at.vid AS VARCHAR)), 1, 15)
       |    AS BIGINT)
       |  < CAST(FLOOR(CAST(tmin AS DOUBLE) / CAST(gn AS DOUBLE)
       |      * 1152921504606846976.0) AS BIGINT)
       |ORDER BY vec_id""".stripMargin

  /** LSH-bucketed top-3: each probe searches only its sign-pattern
    * bucket (the 100 TB path — bucket equi-join instead of crossJoin).
    * The oracle replays the identical deterministic bucketing. */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        queriesDf(s, dir), k = 3, numPlanes = NumPlanes, dim = Dim)
      .orderBy(col("qid"), col("rank"))

  val qAnnLshSql: String = {
    val ps = Similarity.planes(NumPlanes, Dim)
    val bq = Similarity.bucketSql("qe", ps)
    val be = Similarity.bucketSql("ee", ps)
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
       |           WHERE vec_id < 10),
       |qb AS (SELECT qid, qe, $bq AS bucket FROM q),
       |e AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS ee FROM embeddings),
       |eb AS (SELECT nid, ee, $be AS bucket FROM e),
       |s AS (SELECT qid, nid,
       |        list_inner_product(qe, ee) /
       |        (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(ee, ee))) AS sim
       |      FROM qb JOIN eb USING (bucket) WHERE nid != qid),
       |r AS (SELECT qid, nid,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
       |      FROM s)
       |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
  }

  /** Product-quantization top-3 (8 subspaces × 16 codes — vectors scan
    * as 8 bytes, 32× compression): deterministic sampled codebook, ADC
    * table scoring. The oracle replays encode and scoring with the same
    * |c|²−2x·c dot-product formulation as the IVF family (sequential
    * folds, bit-identical) and sums the 8 ADC terms in explicit
    * left-to-right order. */
  def qAnnPq(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        queriesDf(s, dir), kNeighbors = 3, codebookMod = 17)
      .orderBy(col("qid"), col("rank"))

  val qAnnPqSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |don AS (SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS kk
      |        FROM v WHERE vec_id % 17 = 0 QUALIFY kk < 16),
      |cb AS (SELECT kk, i, e[i*8+1 : i*8+8] AS c FROM don, range(0, 8) t(i)),
      |cbs AS (SELECT kk, i, c, list_inner_product(c, c) AS cc FROM cb),
      |sc AS (SELECT v.vec_id AS vid, i, kk,
      |         cc - 2.0 * list_inner_product(e[i*8+1 : i*8+8], c) AS s
      |       FROM v, cbs),
      |enc AS (SELECT vid, i, kk AS code FROM (
      |          SELECT *, row_number() OVER (PARTITION BY vid, i ORDER BY s, kk) AS rn
      |          FROM sc) WHERE rn = 1),
      |term AS (SELECT q.vid AS qid, enc.vid AS nid, enc.i, q.s AS t
      |         FROM enc JOIN sc q ON q.i = enc.i AND q.kk = enc.code
      |         WHERE q.vid < 10 AND enc.vid != q.vid),
      |lt AS (SELECT qid, nid, list(t ORDER BY i) AS l FROM term GROUP BY qid, nid),
      |score AS (SELECT qid, nid,
      |            l[1]+l[2]+l[3]+l[4]+l[5]+l[6]+l[7]+l[8] AS s FROM lt),
      |r AS (SELECT qid, nid,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY s, nid) AS INT) AS rank
      |      FROM score)
      |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** PQ with a TRAINED codebook — one joint Lloyd sweep refines the
    * sampled donors across all 8 subspaces in a single distributed
    * pass (composite (subspace, code) cell key), the refined codebook
    * is rounded to 6 decimals on BOTH engines, and the unchanged ADC
    * search runs against it. The oracle replays the sweep with the
    * same |c|²−2x·c argmin and (score, code) tie order, per-dim AVG
    * (round-6 absorbs cross-engine sum-order wobble — the q_kmeans
    * argument), empty cells falling back to their donor slice. */
  def qAnnPqTrained(s: SparkSession, dir: String): DataFrame =
    Similarity.pqTrainedTopK(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        queriesDf(s, dir), kNeighbors = 3, codebookMod = 17)
      .orderBy(col("qid"), col("rank"))

  val qAnnPqTrainedSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |don AS (SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS kk
      |        FROM v WHERE vec_id % 17 = 0 QUALIFY kk < 16),
      |cb0 AS (SELECT kk, i, e[i*8+1 : i*8+8] AS c FROM don, range(0, 8) t(i)),
      |sv AS (SELECT vec_id AS vid, i, e[i*8+1 : i*8+8] AS x
      |       FROM v, range(0, 8) t(i)),
      |s0 AS (SELECT sv.vid, sv.i, cb0.kk, sv.x,
      |         list_inner_product(c, c) - 2.0 * list_inner_product(x, c) AS s
      |       FROM sv JOIN cb0 USING (i)),
      |a0 AS (SELECT vid, i, kk, x FROM (
      |         SELECT *, row_number() OVER (PARTITION BY vid, i ORDER BY s, kk) AS rn
      |         FROM s0) WHERE rn = 1),
      |mm AS (SELECT i, kk, pos, avg(x[pos + 1]) AS mv
      |       FROM a0, range(0, 8) t2(pos) GROUP BY i, kk, pos),
      |mc AS (SELECT i, kk, list(mv ORDER BY pos) AS c FROM mm GROUP BY i, kk),
      |cbt AS (SELECT cb0.kk, cb0.i,
      |          list_transform(coalesce(mc.c, cb0.c), z -> round(z, 6)) AS c
      |        FROM cb0 LEFT JOIN mc ON cb0.i = mc.i AND cb0.kk = mc.kk),
      |cbs AS (SELECT kk, i, c, list_inner_product(c, c) AS cc FROM cbt),
      |sc AS (SELECT v.vec_id AS vid, i, kk,
      |         cc - 2.0 * list_inner_product(e[i*8+1 : i*8+8], c) AS s
      |       FROM v, cbs),
      |enc AS (SELECT vid, i, kk AS code FROM (
      |          SELECT *, row_number() OVER (PARTITION BY vid, i ORDER BY s, kk) AS rn
      |          FROM sc) WHERE rn = 1),
      |term AS (SELECT q.vid AS qid, enc.vid AS nid, enc.i, q.s AS t
      |         FROM enc JOIN sc q ON q.i = enc.i AND q.kk = enc.code
      |         WHERE q.vid < 10 AND enc.vid != q.vid),
      |lt AS (SELECT qid, nid, list(t ORDER BY i) AS l FROM term GROUP BY qid, nid),
      |score AS (SELECT qid, nid,
      |            l[1]+l[2]+l[3]+l[4]+l[5]+l[6]+l[7]+l[8] AS s FROM lt),
      |r AS (SELECT qid, nid,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY s, nid) AS INT) AS rank
      |      FROM score)
      |SELECT qid, nid, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin

  /** Int8-quantized top-5 — the ANN memory-bandwidth path: per-vector
    * symmetric quantization (scale = max|e|/127, q = floor(e/s + 0.5)),
    * quantized-cosine ranking. Every dot product is an exact integer,
    * so the oracle replay has NO summation-order caveat: the scores are
    * bit-identical by construction. */
  def qAnnQuantized(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizedTopK(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        queriesDf(s, dir), k = 5)
      .orderBy(col("qid"), col("rank"))

  val qAnnQuantizedSql: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |z AS (SELECT vec_id, e,
      |        list_max(list_transform(e, x -> abs(x))) / 127.0 AS s FROM v),
      |qz AS (SELECT vec_id,
      |         CASE WHEN s > 0 THEN list_transform(e, x -> floor(x / s + 0.5))
      |              ELSE list_transform(e, x -> 0.0) END AS q
      |       FROM z),
      |sd AS (SELECT vec_id, q, list_inner_product(q, q) AS sq FROM qz
      |       WHERE list_inner_product(q, q) > 0),
      |p AS (SELECT vec_id AS qid, q AS pq, sq AS psq FROM sd WHERE vec_id < 10),
      |pr AS (SELECT qid, sd.vec_id AS nid,
      |         list_inner_product(pq, sd.q) / (sqrt(psq) * sqrt(sd.sq)) AS sim
      |       FROM p, sd WHERE sd.vec_id != qid),
      |r AS (SELECT qid, nid,
      |        CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rank
      |      FROM pr)
      |SELECT qid, nid, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** Per-source quality-percentile trim: keep the longest 40% of each
    * source (score stand-in: n_chars; any scorer column drops in).
    * percent_rank is the standard SQL definition — verbatim oracle. */
  def qQualityTrim(s: SparkSession, dir: String): DataFrame =
    Corpus.percentileTrim(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "n_chars", "doc_id", keepFrac = 0.4)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val qQualityTrimSql: String =
    """WITH r AS (SELECT doc_id, source, n_chars,
      |        percent_rank() OVER (PARTITION BY source
      |          ORDER BY n_chars DESC, doc_id) AS pr
      |      FROM documents)
      |SELECT doc_id, source, n_chars FROM r WHERE pr <= 0.4
      |ORDER BY doc_id""".stripMargin

  /** Deterministic token-budget draw: per source, take documents in
    * seeded content-hash order until 5k chars are drawn (the
    * crossing row is kept). The oracle replays the same md5-derived
    * order and running sum. */
  def qTokenBudget(s: SparkSession, dir: String): DataFrame =
    Corpus.tokenBudgetSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "doc_id", "n_chars", budget = 5000L, seed = "r11")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val qTokenBudgetSql: String =
    """WITH k AS (SELECT doc_id, source, n_chars,
      |        try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR)
      |          || ':budget:r11'), 1, 15) AS BIGINT) AS k
      |      FROM documents),
      |c AS (SELECT doc_id, source, n_chars,
      |        sum(n_chars) OVER (PARTITION BY source ORDER BY k, doc_id
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM k)
      |SELECT doc_id, source, n_chars FROM c
      |WHERE cum - n_chars < 5000 ORDER BY doc_id""".stripMargin

  /** Feature-hashed 64-dim document vectors (the hashing trick) —
    * text → fixed-dim representation at scan speed, no vocabulary
    * table, no shuffle; every entry is an exact signed token count, so
    * the oracle replay is order-independent. Emitted exploded
    * (doc_id, pos, s) so the gate checks all 64 dims of every doc. */
  def qFeatureHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(graft.functions.NativeText.featureHash(
          split(col("text"), " "), 64)))
      .select(col("doc_id"), col("pos"), col("col").as("s"))
      .orderBy(col("doc_id"), col("pos"))

  val qFeatureHashSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |           FROM documents),
      |h AS (SELECT doc_id,
      |        try_cast('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM w),
      |b AS (SELECT doc_id, h % 64 AS b,
      |        CASE WHEN (h >> 59) & 1 = 1 THEN 1 ELSE -1 END AS sgn FROM h),
      |sums AS (SELECT doc_id, b, sum(sgn) AS s FROM b GROUP BY 1, 2),
      |g AS (SELECT d.doc_id, t.i FROM (SELECT DISTINCT doc_id FROM documents) d,
      |      range(0, 64) t(i))
      |SELECT g.doc_id, CAST(g.i AS INT) AS pos,
      |  CAST(coalesce(sums.s, 0) AS BIGINT) AS s
      |FROM g LEFT JOIN sums ON g.doc_id = sums.doc_id AND g.i = sums.b
      |ORDER BY g.doc_id, pos""".stripMargin

  /** Exact corpus-word top-20 via the Misra-Gries candidate pass
    * (custom TypedImperativeAggregate, two-pass exactification): the
    * scale path for heavy hitters over unbounded vocabularies — no
    * full-vocabulary shuffle, summaries merge map-side. The oracle is
    * the plain exact top-20, which the two-pass answer equals by the
    * MG retention guarantee. */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    Sketches.heavyHitters(
        Tables.documents(s, dir)
          .select(explode(split(col("text"), " ")).as("word")),
        "word", k = 20, capacity = 512)
      .orderBy(col("cnt").desc, col("word"))

  val qHeavyHittersSql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |SELECT word, count(*) AS cnt FROM w
      |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin

  /** Corpus bigram-LM quality score (in-domain perplexity filter):
    * the model is trained on the same corpus it scores — the standard
    * curation setup. Tokenization is the single-space split every text
    * query shares (the oracle's string_split). */
  def qPerplexity(s: SparkSession, dir: String): DataFrame =
    Corpus.bigramLmScore(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w")
      .orderBy(col("doc_id"))

  val qPerplexitySql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |b AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
      |      FROM (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM d)),
      |bc AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
      |uc AS (SELECT w1, count(*) AS cu FROM b GROUP BY 1),
      |v AS (SELECT count(DISTINCT u.w) AS vs
      |      FROM (SELECT unnest(w) AS w FROM d) u),
      |lp AS (SELECT b.doc_id,
      |         ln((bc.cb + 0.4) / (uc.cu + 0.4 * v.vs)) AS l
      |       FROM b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(sum(l) / count(*), 6) AS avg_logprob
      |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin

  /** The shared CTE front of the Kneser-Ney oracles: bigram stream,
    * counts, context/continuation aggregates, and the 3-integer scalar
    * — the SQL transliteration of [[Corpus.knCounts]] + the derived
    * relations of [[Corpus.knModel]]. */
  private def knCtes: String =
    """d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |b AS MATERIALIZED (
      |      SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
      |      FROM (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM d)),
      |c AS MATERIALIZED (
      |      SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
      |ctx AS (SELECT w1, sum(cb) AS c1, count(*) AS nf FROM c GROUP BY 1),
      |rts AS (SELECT w2, count(*) AS nb FROM c GROUP BY 1),
      |s AS (SELECT count(*) AS bt,
      |        sum(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS n1,
      |        sum(CASE WHEN cb = 2 THEN 1 ELSE 0 END) AS n2 FROM c)""".stripMargin

  /** The KN probability term in the exact operation order
    * [[Corpus]].knLogTermInput evaluates (the 6-decimal determinism
    * contract): ((cb − D) + ((D·nf)·(nb/bt))) / c1, D = n1/(n1+2·n2)
    * with KenLM's 0.5 fallback when the count-of-counts degenerate. */
  private def knDiscountSql: String =
    "(CASE WHEN n1 + 2 * n2 > 0" +
      " THEN CAST(n1 AS DOUBLE) / CAST(n1 + 2 * n2 AS DOUBLE)" +
      " ELSE 0.5 END)"

  private def knTermSql: String =
    s"(CAST(cb AS DOUBLE) - $knDiscountSql" +
      s" + $knDiscountSql" +
      " * CAST(nf AS DOUBLE) * (CAST(nb AS DOUBLE) / CAST(bt AS DOUBLE)))" +
      " / CAST(c1 AS DOUBLE)"

  /** Interpolated Kneser-Ney bigram model over the corpus
    * ([[Corpus.knModel]] — the KenLM-family estimator behind CCNet's
    * perplexity filter), restricted to bigram types seen ≥ 3 times
    * (the emit bound; the full model at scale is the counts table
    * itself plus two vocabulary-sized aggregates). Every formula
    * input (cb, c1, nf, nb, n1, n2, bt) is an exact integer in both
    * engines, so p_kn agrees bit-for-bit before the 6-decimal
    * round. */
  def qKnLm(s: SparkSession, dir: String): DataFrame =
    Corpus.knModelFromJoined(knJoinedStaged(s, dir))
      .where(col("cb") >= 3)
      .orderBy(col("w1"), col("w2"))

  val qKnLmSql: String =
    s"""WITH $knCtes
       |SELECT w1, w2, cb, CAST(c1 AS BIGINT) AS c1, nf, nb,
       |  round($knTermSql, 6) AS p_kn
       |FROM c JOIN ctx USING (w1) JOIN rts USING (w2) CROSS JOIN s
       |WHERE cb >= 3 ORDER BY w1, w2""".stripMargin

  /** The bigram count table — [[Corpus.knCounts]] — staged once per
    * (session, dir): it is the model's whole sufficient statistic and
    * feeds both KN gates (and, at scale, IS the stored table the
    * incremental form maintains by addition). */
  private def knCountsStaged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"kn:counts:$dir") {
      Corpus.knCounts(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w")
    }

  /** The order-2 joined model relation ([[Corpus.knJoinedRelation]])
    * staged once per (session, dir) — q_kn_lm and q_kn_score each
    * re-derived the context/continuation aggregates + joins from the
    * staged counts (the [[kn3JoinedStaged]] rationale, order 2;
    * q_kn_incr and q_kn_heldout build DIFFERENT counts — merged and
    * train-split — so they keep the self-contained forms). */
  private def knJoinedStaged(s: SparkSession, dir: String): DataFrame = {
    val counts = knCountsStaged(s, dir)
    graft.Staging.stage(s, s"kn:joined:$dir") {
      Corpus.knJoinedRelation(counts)
    }
  }

  /** Per-document Kneser-Ney perplexity ([[Corpus.knScoreFromCounts]])
    * — the CCNet curation signal with the real KN estimator: average
    * bigram log-probability (round 6) and perplexity exp(−avg)
    * (round 3 — the exp magnifies last-ulp sum wobble by the ppl
    * value itself, so the determinism contract loosens three
    * decimals; avg_logprob stays the 6-decimal witness). */
  def qKnScore(s: SparkSession, dir: String): DataFrame =
    knScoreOrdered(
      Corpus.knScoreFromJoined(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w", knJoinedStaged(s, dir)))

  /** The score-gate output shaping shared across orders: doc_id, the
    * order's own count column (n_bigrams / n_trigrams — position 1 of
    * both scoring operators), avg_logprob (round 6), ppl loosened to
    * round 3. */
  private def knScoreOrdered(scored: DataFrame): DataFrame =
    scored
      .select(col("doc_id"), col(scored.columns(1)), col("avg_logprob"),
        round(col("ppl"), 3).as("ppl"))
      .orderBy(col("doc_id"))

  val qKnScoreSql: String =
    s"""WITH $knCtes,
       |lp AS (SELECT b.doc_id, ln($knTermSql) AS l
       |       FROM b JOIN c USING (w1, w2) JOIN ctx USING (w1)
       |       JOIN rts USING (w2) CROSS JOIN s)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(sum(l) / count(*), 6) AS avg_logprob,
       |  round(round(exp(-(sum(l) / count(*))), 6), 3) AS ppl
       |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin

  /** INCREMENTAL maintenance of the KN model — the [[Corpus.dsirStats]]
    * discipline applied to the LM: the corpus splits into a stored
    * base (doc_id % 10 ≠ 0) and a delta batch, each side aggregates
    * its OWN bigram counts, and the stored table is maintained by
    * per-bigram ADDITION ([[Corpus.knMergeCounts]]) — never re-counted
    * from base text. The gate scores the full corpus from the MERGED
    * table while the oracle recomputes from scratch, so the hash match
    * IS the merge-exactness proof (counts are exact mergeable
    * sufficient statistics; every derived quantity — discount,
    * continuation counts, count-of-counts — re-derives from the merged
    * table bit-for-bit). */
  def qKnIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val merged = Corpus.knMergeCounts(
      Corpus.knCounts(docs.where(col("doc_id") % 10 =!= 0), "doc_id", "w"),
      Corpus.knCounts(docs.where(col("doc_id") % 10 === 0), "doc_id", "w"))
    knScoreOrdered(Corpus.knScoreFromCounts(docs, "doc_id", "w", merged))
  }

  val qKnIncrSql: String = qKnScoreSql

  /** The shared CTE front of the order-3 KN oracles: trigram stream,
    * counts, and every derived relation of [[Corpus]].kn3Joined. */
  private def kn3Ctes: String =
    """d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |t AS MATERIALIZED (
      |      SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2, w[i+3] AS w3
      |      FROM (SELECT doc_id, unnest(range(len(w) - 2)) AS i, w FROM d)),
      |c AS MATERIALIZED (
      |      SELECT w1, w2, w3, count(*) AS c3 FROM t GROUP BY 1, 2, 3),
      |x12 AS (SELECT w1, w2, sum(c3) AS c12, count(*) AS nf12
      |        FROM c GROUP BY 1, 2),
      |b AS MATERIALIZED (
      |      SELECT w2, w3, count(*) AS b23 FROM c GROUP BY 1, 2),
      |x2 AS (SELECT w2, sum(b23) AS s2, count(*) AS nf2 FROM b GROUP BY 1),
      |nb AS (SELECT w3, count(*) AS nb3 FROM b GROUP BY 1),
      |s3 AS (SELECT sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS n1_3,
      |         sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS n2_3 FROM c),
      |s2 AS (SELECT count(*) AS bt2,
      |         sum(CASE WHEN b23 = 1 THEN 1 ELSE 0 END) AS n1_2,
      |         sum(CASE WHEN b23 = 2 THEN 1 ELSE 0 END) AS n2_2 FROM b),
      |s AS (SELECT * FROM s3 CROSS JOIN s2)""".stripMargin

  /** The order-3 KN term in [[Corpus]].kn3TermInput's exact operation
    * order: the level-2 interpolation nested inside the level-3 one,
    * each level's discount from its own count-of-counts with the 0.5
    * fallback. */
  private def knDiscSql(n1: String, n2: String): String =
    s"(CASE WHEN $n1 + 2 * $n2 > 0" +
      s" THEN CAST($n1 AS DOUBLE) / CAST($n1 + 2 * $n2 AS DOUBLE)" +
      " ELSE 0.5 END)"

  /** The level-2 (backoff) term — also the comparison base of the
    * pruning oracle. */
  private def kn3P2Sql: String = {
    val d2 = knDiscSql("n1_2", "n2_2")
    s"(CAST(b23 AS DOUBLE) - $d2 + $d2 * CAST(nf2 AS DOUBLE)" +
      " * (CAST(nb3 AS DOUBLE) / CAST(bt2 AS DOUBLE)))" +
      " / CAST(s2 AS DOUBLE)"
  }

  private def kn3TermSql: String = {
    val d3 = knDiscSql("n1_3", "n2_3")
    s"(CAST(c3 AS DOUBLE) - $d3 + $d3 * CAST(nf12 AS DOUBLE) * ($kn3P2Sql))" +
      " / CAST(c12 AS DOUBLE)"
  }

  /** The trigram count table ([[Corpus.kn3Counts]]) staged once per
    * (session, dir) — the order-3 model's single maintained store,
    * shared by both order-3 gates. */
  private def kn3CountsStaged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"kn3:counts:$dir") {
      Corpus.kn3Counts(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w")
    }

  /** The order-3 joined model relation ([[Corpus.kn3JoinedRelation]])
    * staged once per (session, dir): q_kn3_lm, q_kn3_score and
    * q_kn_prune each re-derived the four model aggregates + four
    * joins from the staged counts (and each plan re-expanded the
    * bigram-type aggregate three times for its three consumers —
    * 48 Exchanges per gate, r22 plan audit). At 100 TB the joined
    * relation IS the stored LM model the scorer ships. Prerequisite
    * counts staged OUTSIDE the builder (acyclic-stage contract). */
  private def kn3JoinedStaged(s: SparkSession, dir: String): DataFrame = {
    val counts = kn3CountsStaged(s, dir)
    graft.Staging.stage(s, s"kn3:joined:$dir") {
      Corpus.kn3JoinedRelation(counts)
    }
  }

  /** Order-3 interpolated Kneser-Ney model ([[Corpus.kn3Model]] — the
    * Chen & Goodman recursion KenLM runs at order 5), restricted to
    * trigram types seen ≥ 3 times. The oracle replays BOTH
    * interpolation levels, both discounts, and the continuation
    * distribution from the same single counts table. */
  def qKn3Lm(s: SparkSession, dir: String): DataFrame =
    Corpus.kn3ModelFromJoined(kn3JoinedStaged(s, dir))
      .where(col("c3") >= 3)
      .orderBy(col("w1"), col("w2"), col("w3"))

  val qKn3LmSql: String =
    s"""WITH $kn3Ctes
       |SELECT w1, w2, w3, c3, round($kn3TermSql, 6) AS p_kn3
       |FROM c JOIN x12 USING (w1, w2) JOIN b USING (w2, w3)
       |JOIN x2 USING (w2) JOIN nb USING (w3) CROSS JOIN s
       |WHERE c3 >= 3 ORDER BY w1, w2, w3""".stripMargin

  /** Per-document order-3 KN perplexity
    * ([[Corpus.kn3ScoreFromCounts]]) — the [[qKnScore]] contract one
    * order up: docs under three tokens drop, ppl loosens to round 3. */
  def qKn3Score(s: SparkSession, dir: String): DataFrame =
    knScoreOrdered(
      Corpus.kn3ScoreFromJoined(
        Tables.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("w")),
        "doc_id", "w", kn3JoinedStaged(s, dir)))

  val qKn3ScoreSql: String =
    s"""WITH $kn3Ctes,
       |lp AS (SELECT t.doc_id, ln($kn3TermSql) AS l
       |       FROM t JOIN c USING (w1, w2, w3) JOIN x12 USING (w1, w2)
       |       JOIN b USING (w2, w3) JOIN x2 USING (w2) JOIN nb USING (w3)
       |       CROSS JOIN s)
       |SELECT doc_id, count(*) AS n_trigrams,
       |  round(sum(l) / count(*), 6) AS avg_logprob,
       |  round(round(exp(-(sum(l) / count(*))), 6), 3) AS ppl
       |FROM lp GROUP BY 1 ORDER BY 1""".stripMargin

  /** Top-50 PMI collocations over the corpus
    * ([[graft.operators.Search.pmiCollocations]], minCount 5):
    * ln(N·c(ab)/(c(a·)·c(·b))) over bigram-slot marginals, rounded to
    * 6 decimals before ranking, ties (w1, w2) asc. One bigram count +
    * two vocab-sized marginal aggs + a TakeOrderedAndProject top-k. */
  def qPmi(s: SparkSession, dir: String): DataFrame =
    graft.operators.Search.pmiCollocations(
      Tables.documents(s, dir), "text", minCount = 5L, k = 50)

  val qPmiSql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |b AS (SELECT w[i+1] AS w1, w[i+2] AS w2
      |  FROM d, unnest(range(len(w) - 1)) AS t(i)),
      |cab AS (SELECT w1, w2, count(*) AS cab FROM b GROUP BY w1, w2),
      |l AS (SELECT w1, CAST(sum(cab) AS BIGINT) AS c1 FROM cab GROUP BY w1),
      |r AS (SELECT w2, CAST(sum(cab) AS BIGINT) AS c2 FROM cab GROUP BY w2),
      |n AS (SELECT CAST(sum(cab) AS BIGINT) AS nb FROM cab)
      |SELECT cab.w1, cab.w2, cab.cab,
      |  round(ln(CAST(nb AS DOUBLE) * CAST(cab AS DOUBLE)
      |    / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 6) AS pmi6
      |FROM cab JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
      |WHERE cab >= 5
      |ORDER BY pmi6 DESC, w1, w2 LIMIT 50""".stripMargin

  /** Weighted sampling without replacement, 20 docs per language
    * weighted by n_chars ([[Corpus.weightedSample]] — the
    * Efraimidis–Spiliotis exponential draw keyed on the content
    * hash): selection probability ∝ length, kept set a pure function
    * of the data. One heap pass on the TopKPerGroup operator. */
  def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Corpus.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          col("n_chars")),
        "lang", "doc_id", "n_chars", k = 20)
      .orderBy(col("doc_id"))

  // WHERE n_chars > 0 mirrors Corpus.weightedSample's weight contract
  // (NULL/non-positive weights are unsampleable) so the null/zero-weight
  // rule lives in BOTH engines — without it a group with fewer than k
  // positive-weight docs would diverge on the Infinity/NULL draws.
  val qWeightedSampleSql: String =
    """WITH d AS (SELECT doc_id, lang, n_chars,
      |    round(-ln((try_cast('0x' ||
      |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1)
      |        / 1152921504606846976.0)
      |      / CAST(n_chars AS DOUBLE), 9) AS draw
      |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0),
      |r AS (SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY draw, doc_id)
      |      AS rn
      |  FROM d)
      |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 20
      |ORDER BY doc_id""".stripMargin

  /** Sorted-neighborhood near-dup pairs
    * ([[TextDedup.sortedNeighborPairs]], window 10, Jaccard ≥ 0.5):
    * the predictable-cost blocking discipline — exactly n·w candidate
    * pairs, global order by text prefix via the two-level rank (no
    * unpartitioned window), neighbor pairing as an integer equi-join.
    * Complements MinHash banding (data-dependent buckets) and prefix
    * filtering (threshold-dependent) on the dedup menu. */
  def qDedupSnm(s: SparkSession, dir: String): DataFrame =
    TextDedup.sortedNeighborPairs(
        Tables.documents(s, dir), "doc_id", "text",
        window = 10, threshold = 0.5,
        // boundary sample staged per (session, input): re-deriving it
        // inside every invocation put a count + sample collect on the
        // query's own clock (the r19 close drift)
        stageKey = Some(s"snm:bounds:text16x32:$dir"))
      .orderBy(col("doc_a"), col("doc_b"))

  val qDedupSnmSql: String =
    """WITH r AS (SELECT doc_id, text,
      |    row_number() OVER (ORDER BY substr(text, 1, 16), doc_id)
      |      AS rn
      |  FROM documents),
      |p AS (SELECT a.doc_id AS ia, a.text AS ta,
      |    b.doc_id AS ib, b.text AS tb
      |  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 10),
      |j AS (SELECT ia, ib,
      |    round(CAST(len(list_intersect(
      |        list_distinct(string_split(ta, ' ')),
      |        list_distinct(string_split(tb, ' ')))) AS DOUBLE)
      |      / CAST(len(list_distinct(string_split(ta, ' ') ||
      |        string_split(tb, ' '))) AS DOUBLE), 6) AS j6
      |  FROM p)
      |SELECT least(ia, ib) AS doc_a, greatest(ia, ib) AS doc_b, j6
      |FROM j WHERE j6 >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** HLL sketch ROLLUP — the mergeable-summary property under the
    * gate, not just the spec: per-(week, day) HLL sketches of the
    * distinct active users are merged REGISTER-WISE (element-wise
    * max) into weekly estimates without rescanning the days — the
    * shape a 100 TB pipeline uses for every distinct-count rollup
    * (daily sketches persist; weekly/monthly/all-time estimates fold
    * from them in any tree). Emits per week: n_days folded, the
    * merged-sketch estimate, and the exact weekly distinct for
    * calibration. m=64 keeps the oracle's register grid small; the
    * idempotent-max merge replays as a plain grouped MAX. */
  def qHllRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      date_trunc("week", col("ts")).as("week"),
      date_trunc("day", col("ts")).as("day"),
      TextDedup.hash60(col("user_id").cast("string")).as("h"))
    val daily = ev.groupBy(col("week"), col("day"))
      .agg(graft.functions.HyperLogLog.hllSketch(col("h"), 64).as("hll"))
    val weekly = daily
      .select(col("week"), posexplode(col("hll")).as(Seq("_p", "_r")))
      .groupBy(col("week"), col("_p")).agg(max(col("_r")).as("_m"))
      .groupBy(col("week"))
      .agg(array_sort(collect_list(struct(col("_p"), col("_m"))))
        .as("_pm"))
      .select(col("week"),
        Sketches.hllEstimate(
          transform(col("_pm"), x => x.getField("_m")), 64).as("est_hll"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("h")).as("n_exact"),
        countDistinct(col("day")).as("n_days"))
    weekly.join(exact, "week")
      .select(col("week"), col("n_days"), col("n_exact"), col("est_hll"))
      .orderBy(col("week"))
  }

  val qHllRollupSql: String =
    s"""WITH ev AS (SELECT date_trunc('week', ts) AS week,
      |    date_trunc('day', ts) AS day,
      |    try_cast('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) AS h
      |  FROM events),
      |b AS (SELECT week, day, h // 18014398509481984 AS bucket,
      |    h % 18014398509481984 AS wr FROM ev),
      |dayreg AS (SELECT week, day, bucket,
      |    MAX(CASE WHEN wr = 0 THEN 55 ELSE 55 - length(bin(wr)) END)
      |      AS rho
      |  FROM b GROUP BY week, day, bucket),
      |weekreg AS (SELECT week, bucket, MAX(rho) AS rho
      |  FROM dayreg GROUP BY week, bucket),
      |wk AS (SELECT DISTINCT week FROM ev),
      |grid AS (SELECT wk.week, r AS bucket
      |  FROM wk, unnest(range(64)) AS u(r)),
      |z AS (SELECT grid.week,
      |    CAST(SUM(CAST(power(2, 55 - coalesce(weekreg.rho, 0)) AS BIGINT))
      |      AS BIGINT) AS zint
      |  FROM grid LEFT JOIN weekreg
      |    ON grid.week = weekreg.week AND grid.bucket = weekreg.bucket
      |  GROUP BY grid.week),
      |ex AS (SELECT week, count(DISTINCT h) AS n_exact,
      |    count(DISTINCT day) AS n_days FROM ev GROUP BY week)
      |SELECT ex.week, ex.n_days, ex.n_exact,
      |  CAST(FLOOR(${Sketches.hllConstant(64)} / CAST(zint AS DOUBLE))
      |    AS BIGINT) AS est_hll
      |FROM ex JOIN z ON ex.week = z.week
      |ORDER BY ex.week""".stripMargin

  /** Daily→weekly QUANTILE-sketch rollup — the mergeable-summary
    * maintenance shape next to [[qHllRollup]], for the quantile
    * family: per (week, day) keep the bottom-64 events by content
    * hash (the [[Sketches.quantileSketch]] sample), then fold the
    * daily sketches into a weekly one by re-taking the bottom 64 of
    * their union. A bottom-k hash sample is EXACTLY mergeable —
    * bottom-k(∪ bottom-k(parts)) = bottom-k(whole) — so the weekly
    * estimate from stored daily sketches equals the direct weekly
    * sketch bit-for-bit (SketchSpec pins the identity); no day is
    * ever rescanned. Emits per week: n_days folded, the merged
    * sample's p50/p90 (type-1 index rule on cents), and the EXACT
    * weekly p50/p90 for calibration (one per-week rank window —
    * value-at-rank is deterministic under ties because the VALUE at
    * a (cents, event_id)-ordered rank depends only on the cents
    * multiset). */
  def qQuantileRollup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(
      date_trunc("week", col("ts")).as("week"),
      date_trunc("day", col("ts")).as("day"),
      col("event_id"),
      floor(col("value") * 100).cast("long").as("cents"),
      TextDedup.hash60(col("event_id").cast("string")).as("h"))
    val wDay = Window.partitionBy(col("week"), col("day"))
      .orderBy(col("h"), col("event_id"))
    val daily = ev.withColumn("_rn", row_number().over(wDay))
      .where(col("_rn") <= 64)
      .select(col("week"), col("h"), col("event_id"), col("cents"))
    val wWeek = Window.partitionBy(col("week"))
      .orderBy(col("h"), col("event_id"))
    val weeklySample = daily.withColumn("_rn", row_number().over(wWeek))
      .where(col("_rn") <= 64)
    def typed1(vals: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column, q: Double): org.apache.spark.sql.Column =
      element_at(vals,
        (floor((n - lit(1)).cast("double") * lit(q)) + lit(1)).cast("int"))
    val est = weeklySample.groupBy(col("week"))
      .agg(sort_array(collect_list(col("cents"))).as("_v"),
        count(lit(1)).as("n_sample"))
      .select(col("week"), col("n_sample"),
        typed1(col("_v"), col("n_sample"), 0.5).as("p50_est"),
        typed1(col("_v"), col("n_sample"), 0.9).as("p90_est"))
    val wRank = Window.partitionBy(col("week"))
      .orderBy(col("cents"), col("event_id"))
    val ranked = ev
      .withColumn("_r", row_number().over(wRank))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("week"))))
    val exact = ranked
      .withColumn("_i50",
        (floor((col("_n") - lit(1)).cast("double") * lit(0.5)) + lit(1)))
      .withColumn("_i90",
        (floor((col("_n") - lit(1)).cast("double") * lit(0.9)) + lit(1)))
      .groupBy(col("week"))
      .agg(max(when(col("_r") === col("_i50"), col("cents"))).as("p50_exact"),
        max(when(col("_r") === col("_i90"), col("cents"))).as("p90_exact"),
        countDistinct(col("day")).as("n_days"))
    est.join(exact, "week")
      .select(col("week"), col("n_days"), col("n_sample"),
        col("p50_est"), col("p90_est"), col("p50_exact"), col("p90_exact"))
      .orderBy(col("week"))
  }

  val qQuantileRollupSql: String =
    """WITH ev AS (SELECT date_trunc('week', ts) AS week,
      |    date_trunc('day', ts) AS day, event_id,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
      |    try_cast('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) AS h
      |  FROM events),
      |daily AS (SELECT week, h, event_id, cents FROM (
      |    SELECT week, day, h, event_id, cents,
      |      row_number() OVER (PARTITION BY week, day
      |        ORDER BY h, event_id) AS rn
      |    FROM ev) WHERE rn <= 64),
      |wk AS (SELECT week, h, event_id, cents FROM (
      |    SELECT week, h, event_id, cents,
      |      row_number() OVER (PARTITION BY week
      |        ORDER BY h, event_id) AS rn
      |    FROM daily) WHERE rn <= 64),
      |est AS (SELECT week,
      |    array_agg(cents ORDER BY cents) AS vals,
      |    COUNT(*) AS n_sample
      |  FROM wk GROUP BY week),
      |rk AS (SELECT week, cents,
      |    row_number() OVER (PARTITION BY week
      |      ORDER BY cents, event_id) AS r,
      |    count(*) OVER (PARTITION BY week) AS n
      |  FROM ev),
      |ex AS (SELECT week,
      |    MAX(CASE WHEN r = CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1
      |      THEN cents END) AS p50_exact,
      |    MAX(CASE WHEN r = CAST(FLOOR((n - 1) * 0.9) AS BIGINT) + 1
      |      THEN cents END) AS p90_exact
      |  FROM rk GROUP BY week),
      |nd AS (SELECT week, count(DISTINCT day) AS n_days
      |  FROM ev GROUP BY week)
      |SELECT est.week, nd.n_days, est.n_sample,
      |  CAST(vals[CAST(FLOOR((n_sample - 1) * 0.5) AS INT) + 1] AS BIGINT)
      |    AS p50_est,
      |  CAST(vals[CAST(FLOOR((n_sample - 1) * 0.9) AS INT) + 1] AS BIGINT)
      |    AS p90_est,
      |  ex.p50_exact, ex.p90_exact
      |FROM est JOIN ex ON est.week = ex.week
      |  JOIN nd ON est.week = nd.week
      |ORDER BY est.week""".stripMargin

  /** Jaro–Winkler vocabulary near-matches
    * ([[graft.functions.StringSim.jaroWinkler]], a native codegen'd
    * kernel — Spark has no built-in jaro): all distinct-word pairs
    * scoring ≥ 0.6 (spanning both the boosted and unboosted branches),
    * round-6 before the threshold. The pair join is vocabulary², a
    * dimension-sized relation — the production shape blocks first
    * (q_fuzzy_join's gram prefixes) and uses this kernel as the
    * verifier; the gate scores the kernel itself against DuckDB's
    * built-in `jaro_winkler_similarity`. */
  def qJaroMatch(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
    val a = v.select(col("w").as("w1"))
    val b = v.select(col("w").as("w2"))
    a.join(b, col("w1") < col("w2"))
      .withColumn("jw6", round(graft.functions.StringSim.jaroWinkler(
        col("w1"), col("w2")), 6))
      .where(col("jw6") >= 0.6)
      .orderBy(col("w1"), col("w2"))
  }

  val qJaroMatchSql: String =
    """WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
      |  FROM documents)
      |SELECT a.w AS w1, b.w AS w2,
      |  round(jaro_winkler_similarity(a.w, b.w), 6) AS jw6
      |FROM v a JOIN v b ON a.w < b.w
      |WHERE round(jaro_winkler_similarity(a.w, b.w), 6) >= 0.6
      |ORDER BY w1, w2""".stripMargin

  /** Robust length outliers by the MAD rule
    * ([[graft.operators.Profile.madOutliers]], c=2, per source):
    * type-1 medians under the (value, id) total order, BIGINT
    * deviations — zero floating steps, the flag replays exactly. */
  def qMad(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.madOutliers(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "n_chars", "doc_id", c = 2)
      .orderBy(col("doc_id"))

  val qMadSql: String =
    """WITH r AS (SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS rk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |med AS (SELECT source, n_chars AS med FROM r
      |  WHERE rk = (n - 1) // 2 + 1),
      |d AS (SELECT doc_id, documents.source, n_chars, med,
      |    abs(n_chars - med) AS dev
      |  FROM documents JOIN med ON documents.source = med.source),
      |r2 AS (SELECT *, row_number() OVER (PARTITION BY source
      |      ORDER BY dev, doc_id) AS rk2,
      |    count(*) OVER (PARTITION BY source) AS n2
      |  FROM d),
      |mad AS (SELECT source, dev AS mad FROM r2
      |  WHERE rk2 = (n2 - 1) // 2 + 1)
      |SELECT doc_id, d.source, n_chars, med, mad
      |FROM d JOIN mad ON d.source = mad.source
      |WHERE dev > 2 * mad
      |ORDER BY doc_id""".stripMargin

  /** Nearest-centroid classification confusion matrix over the
    * embeddings ([[graft.operators.Similarity.nearestCentroidConfusion]]):
    * micro-unit quantization makes every distance a BIGINT sum and
    * the argmin total — the "do the classes separate" sanity pass,
    * exact end to end. */
  /** The nearest-centroid confusion matrix staged once per
    * (session, dir) — q_centroid_classify emits it and q_classify_f1
    * derives the per-label scorecard from it; each previously re-ran
    * the centroid build + scoring pass. The staged table is
    * labels²-sized. */
  private def centroidConfStaged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"ann:centconf:$dir") {
      graft.operators.Similarity.nearestCentroidConfusion(
        Tables.embeddings(s, dir), "vec_id", "label", "embedding")
    }

  def qCentroidClassify(s: SparkSession, dir: String): DataFrame =
    centroidConfStaged(s, dir)
      .orderBy(col("label"), col("pred"))

  val qCentroidClassifySql: String =
    """WITH m AS (SELECT vec_id, label, i AS p,
      |    CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1e6) AS BIGINT)
      |      AS v
      |  FROM embeddings, unnest(range(len(embedding))) AS t(i)),
      |cent AS (SELECT label AS cl, p,
      |    CAST(FLOOR(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
      |  FROM m GROUP BY label, p),
      |dist AS (SELECT m.vec_id, m.label, cent.cl,
      |    CAST(sum((m.v - cent.cv) * (m.v - cent.cv)) AS BIGINT) AS d
      |  FROM m JOIN cent ON m.p = cent.p
      |  GROUP BY m.vec_id, m.label, cent.cl),
      |best AS (SELECT vec_id, label, cl,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rk
      |  FROM dist)
      |SELECT label, cl AS pred, count(*) AS n
      |FROM best WHERE rk = 1
      |GROUP BY label, cl
      |ORDER BY label, pred""".stripMargin

  // --- retrieval / clustering evaluation + diversified selection --------

  /** Recall@3 of the IVF index (nprobe=1) against exact brute-force
    * truth ([[graft.operators.Eval.recallAtK]]) — the eval gate every
    * ANN knob is tuned against. Both retrievals are the gated
    * q_ann_topk / q_ann_ivf algorithms verbatim; the oracle replays
    * them and scores the intersection, so the gate hash-checks the
    * MEASUREMENT, not just the retrievals. Evaluation cost is
    * (probes × k)-sized regardless of index size. */
  /** NDCG@5 + MRR of the IVF (nprobe = 1) retrieval against the exact
    * top-5 truth — the standard GRADED retrieval metrics the eval
    * shelf's recall@k cannot express (recall is blind to ORDER within
    * the cut; NDCG discounts each hit by its position, MRR scores the
    * first hit alone). Graded relevance = 6 − truth_rank (5…1), 0 for
    * non-truth; discount weights use the natural log (the base cancels
    * in DCG/IDCG, and ln is the proven cross-engine-parity kernel
    * here — log2 would route through a different libm entry point on
    * each engine). IDCG is the perfect-ordering constant, computed as
    * the same expression on both engines. Both sides read the staged
    * truth/assignment tables. */
  def qNdcg(s: SparkSession, dir: String): DataFrame = {
    val truth = truth5Staged(s, dir)
      .select(col("qid"), col("nid"),
        (lit(6) - col("rank")).cast("double").as("rel"))
    val retr = Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir),
      queriesDf(s, dir), k = 5, ivfCentroids(s, dir), nprobe = 1)
    val idcg = (1 to 5).map(i =>
      lit(6.0 - i) / log(lit(i + 1.0))).reduce(_ + _)
    retr.join(truth, Seq("qid", "nid"), "left")
      .select(col("qid"),
        (coalesce(col("rel"), lit(0.0)) /
          log(col("rank").cast("double") + lit(1.0))).as("g"),
        when(col("rel").isNotNull,
          lit(1.0) / col("rank").cast("double")).as("rr_i"))
      .groupBy(col("qid"))
      .agg(round(sum(col("g")) / idcg, 6).as("ndcg"),
        round(coalesce(max(col("rr_i")), lit(0.0)), 6).as("mrr"))
      .orderBy(col("qid"))
  }

  val qNdcgSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
       |ts AS (SELECT qid, v.vec_id AS nid,
       |    list_inner_product(qe, v.e) /
       |    (sqrt(list_inner_product(qe, qe)) *
       |     sqrt(list_inner_product(v.e, v.e))) AS sim
       |  FROM q, v WHERE v.vec_id != qid),
       |truth AS (SELECT qid, nid, CAST(6 - rk AS DOUBLE) AS rel FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ts) WHERE rk <= 5),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |scored AS (SELECT v.vec_id AS vid, v.e, cent.cid,
       |    list_inner_product(c, c) - 2.0 * list_inner_product(v.e, c) AS score
       |  FROM v, cent),
       |assigned AS (SELECT vid, e, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |iq AS (SELECT vid AS qid, e AS qv, cell FROM assigned WHERE vid < 10),
       |ivs AS (SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) *
       |     sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM iq JOIN assigned a USING (cell) WHERE a.vid != qid),
       |retr AS (SELECT qid, nid, rk AS rank FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ivs) WHERE rk <= 5),
       |g AS (SELECT retr.qid,
       |    coalesce(truth.rel, 0.0) / ln(CAST(rank AS DOUBLE) + 1.0) AS g,
       |    CASE WHEN truth.rel IS NOT NULL
       |         THEN 1.0 / CAST(rank AS DOUBLE) END AS rr_i
       |  FROM retr LEFT JOIN truth ON truth.qid = retr.qid
       |    AND truth.nid = retr.nid)
       |SELECT qid,
       |  round(sum(g) / (5.0 / ln(2.0) + 4.0 / ln(3.0) + 3.0 / ln(4.0)
       |    + 2.0 / ln(5.0) + 1.0 / ln(6.0)), 6) AS ndcg,
       |  round(coalesce(max(rr_i), 0.0), 6) AS mrr
       |FROM g GROUP BY qid ORDER BY qid""".stripMargin

  /** RBO@5 (p = 0.9) of the IVF (nprobe = 1) retrieval against the
    * exact top-5 — the prefix-weighted rank-agreement measurement
    * ([[graft.operators.Eval.rankBiasedOverlap]]) between the two
    * rankings the recall and NDCG gates already compare as sets and
    * graded lists. The per-item closed-form coefficients are k
    * Scala-side doubles interpolated into the oracle verbatim
    * (shortest-round-trip repr parses back to the identical double),
    * so both engines weigh each common item bit-identically. */
  def qRbo(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.rankBiasedOverlap(
        truth5Staged(s, dir).select(col("qid"), col("nid"), col("rank")),
        Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir),
          queriesDf(s, dir), k = 5, ivfCentroids(s, dir), nprobe = 1),
        k = 5, p = 0.9)
      .orderBy(col("qid"))

  val qRboSql: String = {
    val k = 5; val p = 0.9
    val c = (1 - p) / (1 - math.pow(p, k))
    val cases = (1 to k).map(m =>
      s"WHEN $m THEN ${c * (m to k).map(d => math.pow(p, d - 1) / d).sum}")
      .mkString(" ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
       |ts AS (SELECT qid, v.vec_id AS nid,
       |    list_inner_product(qe, v.e) /
       |    (sqrt(list_inner_product(qe, qe)) *
       |     sqrt(list_inner_product(v.e, v.e))) AS sim
       |  FROM q, v WHERE v.vec_id != qid),
       |truth AS (SELECT qid, nid, rk FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ts) WHERE rk <= 5),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v
       |  WHERE vec_id % $CentroidMod = 0),
       |scored AS (SELECT v.vec_id AS vid, v.e, cent.cid,
       |    list_inner_product(c, c) - 2.0 * list_inner_product(v.e, c)
       |      AS score
       |  FROM v, cent),
       |assigned AS (SELECT vid, e, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid
       |      ORDER BY score, cid) AS rn FROM scored) WHERE rn = 1),
       |iq AS (SELECT vid AS qid, e AS qv, cell FROM assigned
       |  WHERE vid < 10),
       |ivs AS (SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) *
       |     sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM iq JOIN assigned a USING (cell) WHERE a.vid != qid),
       |retr AS (SELECT qid, nid, rk AS rank FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ivs) WHERE rk <= 5),
       |j AS (SELECT truth.qid, greatest(truth.rk, retr.rank) AS m
       |  FROM truth JOIN retr ON truth.qid = retr.qid
       |    AND truth.nid = retr.nid),
       |co AS (SELECT qid, count(*) AS n_common,
       |    sum(CASE m $cases END) AS s FROM j GROUP BY qid)
       |SELECT tq.qid, CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
       |  round(coalesce(s, 0.0), 6) + 0.0 AS rbo
       |FROM (SELECT DISTINCT qid FROM truth) tq LEFT JOIN co USING (qid)
       |ORDER BY tq.qid""".stripMargin
  }

  def qAnnRecall(s: SparkSession, dir: String): DataFrame = {
    // both sides read staged tables (truth5 rank ≤ 3 IS the exact
    // top-3; recallAtK filters both sides to k)
    val truth = truth5Staged(s, dir)
    val approx = Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir),
      queriesDf(s, dir), k = 3, ivfCentroids(s, dir), nprobe = 1)
    graft.operators.Eval.recallAtK(truth, approx, k = 3)
      .orderBy(col("qid"))
  }

  val qAnnRecallSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
       |ts AS (SELECT qid, v.vec_id AS nid,
       |    list_inner_product(qe, v.e) /
       |    (sqrt(list_inner_product(qe, qe)) *
       |     sqrt(list_inner_product(v.e, v.e))) AS sim
       |  FROM q, v WHERE v.vec_id != qid),
       |truth AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ts) WHERE rk <= 3),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |scored AS (SELECT v.vec_id AS vid, v.e, cent.cid,
       |    list_inner_product(c, c) - 2.0 * list_inner_product(v.e, c) AS score
       |  FROM v, cent),
       |assigned AS (SELECT vid, e, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |iq AS (SELECT vid AS qid, e AS qv, cell FROM assigned WHERE vid < 10),
       |ivs AS (SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) *
       |     sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM iq JOIN assigned a USING (cell) WHERE a.vid != qid),
       |approx AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ivs) WHERE rk <= 3)
       |SELECT t.qid, count(a.nid) AS hits,
       |  round(count(a.nid) / count(*), 6) + 0.0 AS recall
       |FROM truth t LEFT JOIN approx a ON a.qid = t.qid AND a.nid = t.nid
       |GROUP BY t.qid ORDER BY t.qid""".stripMargin

  /** ANN index SCOREBOARD: recall@3 of three gated retrieval variants
    * — IVF nprobe=1, IVF nprobe=2, JL-projected two-stage rerank —
    * against the exact brute-force truth, one row per method from ONE
    * truth computation (lineage-cut, 30 rows). The index-selection
    * gate: which approximation is worth its speed on THIS corpus.
    * recall = Σ hits / Σ truth rows (exact integers, one division);
    * the oracle replays all three retrievals + the truth + the
    * scoring. The nprobe=2 row dominating nprobe=1 is the knob's
    * value, measured. */
  def qAnnScoreboard(s: SparkSession, dir: String): DataFrame = {
    val qs = queriesDf(s, dir)
    // staged family prefixes throughout: truth, the IVF assignment and
    // the projected rerank are each read, never recomputed per row
    val truth = truth5Staged(s, dir).filter(col("rank") <= 3)
      .select(col("qid"), col("nid"))
    def score(name: String, approx: DataFrame): DataFrame = {
      val hits = truth.join(
        approx.filter(col("rank") <= 3).select(col("qid"), col("nid")),
        Seq("qid", "nid"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(hits.agg(count(lit(1)).as("hits")))
        .select(lit(name).as("method"), col("n_truth"), col("hits"),
          (round(col("hits").cast("double") / col("n_truth").cast("double"),
            6) + lit(0.0)).as("recall"))
    }
    score("ivf_nprobe1",
        Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir), qs, k = 3,
          ivfCentroids(s, dir), nprobe = 1))
      .unionAll(score("ivf_nprobe2",
        Similarity.ivfTopKAssigned(ivfAssignedStaged(s, dir), qs, k = 3,
          ivfCentroids(s, dir), nprobe = 2)))
      .unionAll(score("proj_rerank", projRerank5Staged(s, dir)))
      .orderBy(col("method"))
  }

  val qAnnScoreboardSql: String =
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
       |ts AS (SELECT qid, v.vec_id AS nid,
       |    list_inner_product(qe, v.e) /
       |    (sqrt(list_inner_product(qe, qe)) *
       |     sqrt(list_inner_product(v.e, v.e))) AS sim
       |  FROM q, v WHERE v.vec_id != qid),
       |truth AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ts) WHERE rk <= 3),
       |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
       |cent AS (SELECT vec_id AS cid, e AS c FROM v WHERE vec_id % $CentroidMod = 0),
       |scored AS (SELECT v.vec_id AS vid, v.e, cent.cid,
       |    list_inner_product(c, c) - 2.0 * list_inner_product(v.e, c) AS score
       |  FROM v, cent),
       |assigned AS (SELECT vid, e, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored) WHERE rn = 1),
       |iq1 AS (SELECT vid AS qid, e AS qv, cell FROM assigned WHERE vid < 10),
       |ivs1 AS (SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) *
       |     sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM iq1 JOIN assigned a USING (cell) WHERE a.vid != qid),
       |ap1 AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ivs1) WHERE rk <= 3),
       |iq2 AS (SELECT vid AS qid, e AS qv, cid AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vid ORDER BY score, cid) AS rn
       |    FROM scored WHERE vid < 10) WHERE rn <= 2),
       |ivs2 AS (SELECT qid, a.vid AS nid,
       |    list_inner_product(qv, a.e) /
       |    (sqrt(list_inner_product(qv, qv)) *
       |     sqrt(list_inner_product(a.e, a.e))) AS sim
       |  FROM iq2 JOIN assigned a USING (cell) WHERE a.vid != qid),
       |ap2 AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ivs2) WHERE rk <= 3),
       |pr AS (SELECT j, list(CASE WHEN try_cast('0x' ||
       |      substr(md5('rp15:' || i || ':' || j), 1, 15) AS BIGINT) % 2 = 0
       |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS sgn
       |    FROM unnest(range(16)) AS tj(j), unnest(range(64)) AS ti(i)
       |    GROUP BY j),
       |p AS (SELECT v.vec_id,
       |        list(round(list_inner_product(v.e, pr.sgn) / sqrt(16.0), 6) + 0.0
       |          ORDER BY pr.j) AS px
       |      FROM v, pr GROUP BY v.vec_id),
       |ppq AS (SELECT vec_id AS qid, px AS qpx FROM p WHERE vec_id < 10),
       |ps1 AS (SELECT qid, p.vec_id AS nid,
       |        list_inner_product(qpx, p.px) /
       |        (sqrt(list_inner_product(qpx, qpx)) *
       |         sqrt(list_inner_product(p.px, p.px))) AS sim
       |      FROM ppq, p WHERE p.vec_id != qid),
       |pshort AS (SELECT qid, nid FROM (
       |        SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |          ORDER BY sim DESC, nid) AS rk FROM ps1) WHERE rk <= 20),
       |pqe AS (SELECT vec_id AS qid, e AS qx FROM v WHERE vec_id < 10),
       |ps2 AS (SELECT pshort.qid, pshort.nid,
       |        list_inner_product(qx, v.e) /
       |        (sqrt(list_inner_product(qx, qx)) *
       |         sqrt(list_inner_product(v.e, v.e))) AS sim
       |      FROM pshort JOIN v ON v.vec_id = pshort.nid
       |        JOIN pqe ON pqe.qid = pshort.qid),
       |ap3 AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM ps2) WHERE rk <= 3),
       |sb AS (
       |  SELECT 'ivf_nprobe1' AS method,
       |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
       |      JOIN ap1 a ON a.qid = t.qid AND a.nid = t.nid) AS hits
       |  UNION ALL
       |  SELECT 'ivf_nprobe2',
       |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
       |      JOIN ap2 a ON a.qid = t.qid AND a.nid = t.nid)
       |  UNION ALL
       |  SELECT 'proj_rerank',
       |    (SELECT CAST(count(*) AS BIGINT) FROM truth t
       |      JOIN ap3 a ON a.qid = t.qid AND a.nid = t.nid))
       |SELECT method, n_truth, hits,
       |  round(CAST(hits AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) + 0.0
       |    AS recall
       |FROM sb, nt ORDER BY method""".stripMargin

  /** MMR diversified top-5 over a 20-candidate shortlist
    * ([[graft.operators.Eval.mmrSelect]], λ = 0.75 — exact in binary,
    * so (1−λ) is too): the selection pass that turns "most similar"
    * into "similar AND diverse". The oracle replays shortlist and all
    * five greedy rounds verbatim — every pick and its round-6 MMR
    * score is hash-checked. */
  /** The greedy-MMR diversified selection (k=5, m=20, λ=0.75) staged
    * once per (session, dir): the five-round driver loop is the whole
    * cost of BOTH its consumers — q_mmr emits the picks, q_ild
    * measures their diversity — and each previously re-ran all five
    * rounds (r22 PhaseTimes: build 5.1 s / 4.4 s). At scale the
    * selection IS the stored product the training-set assembler
    * reads. */
  private def mmr5Staged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"ann:mmr5:$dir") {
      graft.operators.Eval.mmrSelect(
        embCorpus(s, dir), queriesDf(s, dir), k = 5, m = 20, lambda = 0.75)
    }

  def qMmr(s: SparkSession, dir: String): DataFrame =
    mmr5Staged(s, dir)
      .orderBy(col("qid"), col("pick"))

  private def cosSql(x: String, y: String): String =
    s"""list_inner_product($x, $y) /
       |      (sqrt(list_inner_product($x, $x)) *
       |       sqrt(list_inner_product($y, $y)))""".stripMargin

  /** The greedy-MMR CTE chain through sel5 — shared by the selection
    * gate and the diversity-measurement gate so the replayed
    * algorithm can never drift between them. */
  private val mmrCtes: String = {
    val rounds = (2 to 5).map { t =>
      val prev = s"sel${t - 1}"
      s"""c$t AS (SELECT c.* FROM short c WHERE NOT EXISTS (
         |    SELECT 1 FROM $prev s WHERE s.qid = c.qid AND s.nid = c.nid)),
         |p$t AS (SELECT c.qid, c.nid, max(${cosSql("c.e", "s.e")}) AS pen
         |  FROM c$t c JOIN $prev s ON s.qid = c.qid GROUP BY c.qid, c.nid),
         |m$t AS (SELECT c.qid, c.nid, c.e,
         |    0.75 * c.sim - 0.25 * p.pen AS mmr
         |  FROM c$t c JOIN p$t p ON p.qid = c.qid AND p.nid = c.nid),
         |pk$t AS (SELECT qid, nid, e, CAST($t AS INT) AS pick, mmr FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY mmr DESC, nid) AS rk FROM m$t) WHERE rk = 1),
         |sel$t AS (SELECT * FROM $prev UNION ALL SELECT * FROM pk$t)""".stripMargin
    }.mkString(",\n")
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 10),
       |s0 AS (SELECT qid, v.vec_id AS nid,
       |    ${cosSql("qe", "v.e")} AS sim, v.e AS e
       |  FROM q, v WHERE v.vec_id != qid),
       |short AS (SELECT qid, nid, sim, e FROM (
       |    SELECT qid, nid, sim, e, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM s0) WHERE rk <= 20),
       |sel1 AS (SELECT qid, nid, e, CAST(1 AS INT) AS pick,
       |    0.75 * sim AS mmr FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY 0.75 * sim DESC, nid) AS rk FROM short) WHERE rk = 1),
       |$rounds""".stripMargin
  }

  val qMmrSql: String =
    s"""WITH $mmrCtes
       |SELECT qid, nid, pick, round(mmr, 6) + 0.0 AS mmr FROM sel5
       |ORDER BY qid, pick""".stripMargin

  /** Intra-list diversity head-to-head
    * ([[graft.operators.Eval.intraListDiversity]]): per-query mean
    * pairwise cosine distance among the MMR picks vs the plain exact
    * top-5 — the measurement that justifies the diversifier (MMR's
    * rows must dominate). Both selections read staged tables; pair
    * terms are nano-unit exact. */
  def qIld(s: SparkSession, dir: String): DataFrame = {
    val corpus = embCorpus(s, dir)
    val topk = graft.operators.Eval.intraListDiversity(
        truth5Staged(s, dir).select(col("qid"), col("nid")), corpus)
      .select(lit("topk").as("method"), col("qid"), col("ild6"))
    val mmr = graft.operators.Eval.intraListDiversity(
        mmr5Staged(s, dir).select(col("qid"), col("nid")),
        corpus)
      .select(lit("mmr").as("method"), col("qid"), col("ild6"))
    topk.unionAll(mmr).orderBy(col("method"), col("qid"))
  }

  val qIldSql: String =
    s"""WITH $mmrCtes,
       |tsx AS (SELECT qid, v.vec_id AS nid,
       |    ${cosSql("qe", "v.e")} AS sim
       |  FROM q, v WHERE v.vec_id != qid),
       |t5 AS (SELECT qid, nid FROM (
       |    SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, nid) AS rk FROM tsx) WHERE rk <= 5),
       |tv AS (SELECT t5.qid, t5.nid, v.e FROM t5
       |  JOIN v ON v.vec_id = t5.nid),
       |tp AS (SELECT a.qid,
       |    CAST(round((1.0 - ${cosSql("a.e", "b.e")}) * 1e9) AS BIGINT) AS t9
       |  FROM tv a JOIN tv b ON a.qid = b.qid AND a.nid < b.nid),
       |ti AS (SELECT 'topk' AS method, qid,
       |    round(CAST(sum(t9) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9),
       |      6) + 0.0 AS ild6
       |  FROM tp GROUP BY qid),
       |mp AS (SELECT a.qid,
       |    CAST(round((1.0 - ${cosSql("a.e", "b.e")}) * 1e9) AS BIGINT) AS t9
       |  FROM sel5 a JOIN sel5 b ON a.qid = b.qid AND a.nid < b.nid),
       |mi AS (SELECT 'mmr' AS method, qid,
       |    round(CAST(sum(t9) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9),
       |      6) + 0.0 AS ild6
       |  FROM mp GROUP BY qid)
       |SELECT method, qid, ild6 FROM ti
       |UNION ALL SELECT method, qid, ild6 FROM mi
       |ORDER BY method, qid""".stripMargin

  /** Per-point simplified silhouette of the labeled clustering
    * ([[graft.operators.Eval.silhouette]]): micro-unit quantization
    * makes every numerator an order-free exact BIGINT, so a(i), b(i),
    * s(i) are reproducible to the bit on both engines — the internal
    * clustering-quality score, from ONE scan + a k-row broadcast
    * instead of all-pairs distances. */
  def qSilhouette(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.silhouette(
        Tables.embeddings(s, dir), "vec_id", "label", "embedding")
      .orderBy(col("pid"))

  val qSilhouetteSql: String =
    """WITH m AS (SELECT vec_id, label, i AS p,
      |    CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1e6) AS BIGINT) AS v
      |  FROM embeddings, unnest(range(len(embedding))) AS t(i)),
      |usq AS (SELECT vec_id, label, CAST(sum(v * v) AS BIGINT) AS usq
      |  FROM m GROUP BY 1, 2),
      |sstat AS (SELECT label AS cl, p, CAST(sum(v) AS BIGINT) AS sp
      |  FROM m GROUP BY 1, 2),
      |cn AS (SELECT label AS cl, count(*) AS n, CAST(sum(usq) AS BIGINT) AS qsum
      |  FROM usq GROUP BY 1),
      |dus AS (SELECT u.vec_id, s.cl, CAST(sum(u.v * s.sp) AS BIGINT) AS dus
      |  FROM m u JOIN sstat s ON s.p = u.p GROUP BY 1, 2),
      |num AS (SELECT q.vec_id, q.label, d.cl, c.n,
      |    c.n * q.usq - 2 * d.dus + c.qsum AS num
      |  FROM usq q JOIN dus d ON d.vec_id = q.vec_id JOIN cn c ON c.cl = d.cl),
      |ab AS (SELECT vec_id, label,
      |    max(CASE WHEN cl = label AND n > 1
      |        THEN CAST(num AS DOUBLE) / CAST(n - 1 AS DOUBLE) END) AS a,
      |    min(CASE WHEN cl != label
      |        THEN CAST(num AS DOUBLE) / CAST(n AS DOUBLE) END) AS b
      |  FROM num GROUP BY 1, 2)
      |SELECT vec_id AS pid, label AS cl,
      |  round(CASE WHEN a IS NULL OR greatest(a, b) <= 0.0 THEN 0.0
      |    ELSE (b - a) / greatest(a, b) END, 6) + 0.0 AS sil
      |FROM ab ORDER BY pid""".stripMargin

  /** CCNet-style per-language head/middle/tail quality buckets
    * ([[Corpus.perplexityBuckets]], Wenzek et al. 2020): the gated
    * bigram-LM score ranked within each language and cut into
    * terciles — the volume-for-quality knob of web-scale curation.
    * The oracle replays the q_perplexity scoring chain + the same
    * ntile window. */
  def qCcnetBuckets(s: SparkSession, dir: String): DataFrame =
    Corpus.perplexityBuckets(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          split(col("text"), " ").as("w")),
        "doc_id", "lang", "w", buckets = 3)
      .orderBy(col("doc_id"))

  val qCcnetBucketsSql: String =
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      |b AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
      |      FROM (SELECT doc_id, unnest(range(len(w) - 1)) AS i, w FROM d)),
      |bc AS (SELECT w1, w2, count(*) AS cb FROM b GROUP BY 1, 2),
      |uc AS (SELECT w1, count(*) AS cu FROM b GROUP BY 1),
      |vv AS (SELECT count(DISTINCT u.w) AS vs
      |      FROM (SELECT unnest(w) AS w FROM d) u),
      |lp AS (SELECT b.doc_id,
      |         ln((bc.cb + 0.4) / (uc.cu + 0.4 * vv.vs)) AS l
      |       FROM b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN vv),
      |sc AS (SELECT doc_id, round(sum(l) / count(*), 6) AS avg_logprob
      |       FROM lp GROUP BY 1),
      |j AS (SELECT sc.doc_id, d.lang, sc.avg_logprob
      |      FROM sc JOIN d USING (doc_id)),
      |t AS (SELECT *, ntile(3) OVER (PARTITION BY lang
      |        ORDER BY avg_logprob DESC, doc_id) AS tile FROM j)
      |SELECT doc_id, lang, avg_logprob,
      |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
      |    ELSE 'tail' END AS bucket
      |FROM t ORDER BY doc_id""".stripMargin

  /** One BPE merge-induction step over the corpus
    * ([[Corpus.bpeMergeCandidates]], Sennrich et al. 2016): top-20
    * corpus-weighted adjacent character pairs — the distributed
    * kernel of tokenizer training (pair counting reduces to
    * vocab-sized work; only the word-frequency aggregation sees
    * corpus rows). */
  def qBpePairs(s: SparkSession, dir: String): DataFrame =
    Corpus.bpeMergeCandidates(Tables.documents(s, dir), "text", k = 20)

  val qBpePairsSql: String =
    """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT w, count(*) AS wc FROM w WHERE len(w) >= 2 GROUP BY w),
      |p AS (SELECT substr(w, i, 1) AS p1, substr(w, i + 1, 1) AS p2, wc
      |      FROM wc, unnest(range(1, len(w))) AS t(i))
      |SELECT p1, p2, CAST(sum(wc) AS BIGINT) AS pair_count
      |FROM p GROUP BY 1, 2
      |ORDER BY pair_count DESC, p1, p2 LIMIT 20""".stripMargin

  /** Confusion matrix of the HEURISTIC stopword-profile language ID
    * against the true labels — the evaluation twin of q_lang_id and
    * the head-to-head comparison row for q_nb_lang (heuristic vs
    * trained on the same corpus, same gate shape): per (lang, pred)
    * counts from one kernel scan + a classes²-bounded aggregation. */
  def qLangIdConf(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        graft.functions.NativeTextStats.langId(
          split(lower(col("text")), "\\s+"),
          TextStats.stopwordProfiles.toSeq.sortBy(_._1)).as("pred"))
      .groupBy(col("lang").as("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred"))

  val qLangIdConfSql: String =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
       |  FROM documents),
       |sc AS (SELECT doc_id, lang,
       |  $langScoreColsSql
       |  FROM t),
       |p AS (SELECT doc_id, lang,
       |  $langArgmaxSql AS pred
       |FROM sc)
       |SELECT lang AS label, pred, count(*) AS n FROM p
       |GROUP BY 1, 2 ORDER BY label, pred""".stripMargin

  /** Corpus DATASHEET (Gebru et al. 2021's "datasheets for datasets",
    * the quantitative rows): seven headline statistics a corpus ships
    * with — sizes, vocabulary, language mix, near-duplicate pair
    * count at τ = 0.5, quality-filter pass rate — in ONE gate whose
    * every row reuses the exact formulation its own gated query
    * proves (the composed-oracle discipline of q_pipeline). All
    * metrics are exact integers or single divisions of them, emitted
    * as round-6 doubles under a (metric, value) schema.
    *
    * near_dup_pairs is the MINHASH-verified pair count while the
    * oracle counts the brute-force exact pairs — equal exactly
    * because q_dedup_minhash's own gate proves set equality at
    * τ = 0.5 on this corpus (the 16×4 band-curve argument); a corpus
    * whose true pairs sat near the threshold would need the exact
    * jaccardSelfJoin here instead. */
  def qDatasheet(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.agg(count(lit(1)).as("nd"),
      sum(size(split(col("text"), " "))).as("nt"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nen"))
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("nv"))
    val pairs = dedupPairs05Staged(s, dir).agg(count(lit(1)).as("npair"))
    val surv = qualitySurvivors(docs).agg(count(lit(1)).as("ns"))
    base.crossJoin(vocab).crossJoin(pairs).crossJoin(surv) // 1-row scalars
      .select(explode(array(
        struct(lit("n_docs").as("metric"),
          col("nd").cast("double").as("value")),
        struct(lit("n_tokens").as("metric"),
          col("nt").cast("double").as("value")),
        struct(lit("vocab_size").as("metric"),
          col("nv").cast("double").as("value")),
        struct(lit("mean_doc_tokens").as("metric"),
          (round(col("nt").cast("double") / col("nd").cast("double"), 6)
            + lit(0.0)).as("value")),
        struct(lit("pct_lang_en").as("metric"),
          (round(col("nen").cast("double") / col("nd").cast("double"), 6)
            + lit(0.0)).as("value")),
        struct(lit("near_dup_pairs").as("metric"),
          col("npair").cast("double").as("value")),
        struct(lit("quality_pass_rate").as("metric"),
          (round(col("ns").cast("double") / col("nd").cast("double"), 6)
            + lit(0.0)).as("value")))).as("r"))
      .select(col("r.metric").as("metric"), col("r.value").as("value"))
      .orderBy(col("metric"))
  }

  val qDatasheetSql: String =
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
       |  FROM documents),
       |base AS (SELECT CAST(count(*) AS BIGINT) AS nd,
       |    CAST(sum(len(w)) AS BIGINT) AS nt,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nen
       |  FROM t),
       |vocab AS (SELECT CAST(count(DISTINCT u.w) AS BIGINT) AS nv
       |  FROM (SELECT unnest(w) AS w FROM t) u),
       |${jaccardPairsCte("0.5")},
       |np AS (SELECT CAST(count(*) AS BIGINT) AS npair FROM pairs),
       |m AS (SELECT doc_id, len(w) AS n_tokens,
       |  len(list_distinct(w)) AS n_distinct,
       |  CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len
       |  FROM t),
       |$bigramDupCte,
       |sc AS (SELECT doc_id,
       |  $langScoreColsSql
       |  FROM t),
       |lang AS (SELECT doc_id,
       |  $langArgmaxSql AS lang_pred
       |  FROM sc),
       |surv AS (SELECT CAST(count(*) AS BIGINT) AS ns
       |  FROM m JOIN lang ON m.doc_id = lang.doc_id
       |    LEFT JOIN a2 ON m.doc_id = a2.doc_id
       |  WHERE NOT (m.n_tokens < 20)
       |    AND NOT (CAST(n_distinct AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) < 0.3)
       |    AND NOT (CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 12.0)
       |    AND NOT (n_tokens >= 3 AND
       |      CAST(COALESCE(dup2, 0) AS DOUBLE) / CAST(n_tokens - 1 AS DOUBLE) > 0.3)
       |    AND lang_pred = 'en')
       |SELECT 'n_docs' AS metric, CAST(nd AS DOUBLE) + 0.0 AS value FROM base
       |UNION ALL SELECT 'n_tokens', CAST(nt AS DOUBLE) + 0.0 FROM base
       |UNION ALL SELECT 'vocab_size', CAST(nv AS DOUBLE) + 0.0 FROM vocab
       |UNION ALL SELECT 'mean_doc_tokens',
       |  round(CAST(nt AS DOUBLE) / CAST(nd AS DOUBLE), 6) + 0.0 FROM base
       |UNION ALL SELECT 'pct_lang_en',
       |  round(CAST(nen AS DOUBLE) / CAST(nd AS DOUBLE), 6) + 0.0 FROM base
       |UNION ALL SELECT 'near_dup_pairs', CAST(npair AS DOUBLE) + 0.0 FROM np
       |UNION ALL SELECT 'quality_pass_rate',
       |  round(CAST(ns AS DOUBLE) / CAST(nd AS DOUBLE), 6) + 0.0
       |  FROM surv, base
       |ORDER BY metric""".stripMargin

  /** Per-SOURCE datasheet — the q_datasheet rows grouped by domain,
    * the table a remix/quota decision actually reads (which sources
    * are long-form, which are English-heavy, how big is each
    * vocabulary): one token-stream aggregation + one per-source doc
    * aggregation, exact integers + round-6 divisions. */
  def qSourceProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val perDoc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nen"))
    val vocab = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"))
      .agg(countDistinct(col("w")).as("n_vocab"))
    perDoc.join(vocab, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_vocab"),
        (round(col("n_tokens").cast("double") / col("n_docs").cast("double"),
          6) + lit(0.0)).as("mean_tokens"),
        (round(col("nen").cast("double") / col("n_docs").cast("double"), 6)
          + lit(0.0)).as("pct_en"))
      .orderBy(col("source"))
  }

  val qSourceProfileSql: String =
    """WITH t AS (SELECT source, lang, string_split(text, ' ') AS w
      |  FROM documents),
      |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(w)) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS nen
      |  FROM t GROUP BY 1),
      |v AS (SELECT source, CAST(count(DISTINCT u.w) AS BIGINT) AS n_vocab
      |  FROM (SELECT source, unnest(w) AS w FROM t) u GROUP BY 1)
      |SELECT d.source, n_docs, n_tokens, n_vocab,
      |  round(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) + 0.0
      |    AS mean_tokens,
      |  round(CAST(nen AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) + 0.0
      |    AS pct_en
      |FROM d JOIN v ON v.source = d.source
      |ORDER BY d.source""".stripMargin

  /** Trained multinomial Naive Bayes language classifier
    * ([[graft.operators.Eval.naiveBayesConfusion]]) — train-on-corpus,
    * add-one smoothing, every log term quantized to integer nano-nats
    * before the order-free exact sum: the TRAINED counterpart of the
    * heuristic q_lang_id, reported as the lang × pred confusion
    * matrix, fully hash-gated. */
  def qNbLang(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.naiveBayesConfusion(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            split(col("text"), " ").as("w")),
        "doc_id", "lang", "w")
      .orderBy(col("label"), col("pred"))

  val qNbLangSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |    unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT lang AS cl, w, count(*) AS cnt FROM t GROUP BY 1, 2),
      |tot AS (SELECT cl, CAST(sum(cnt) AS BIGINT) AS tot FROM wc
      |  GROUP BY 1),
      |vocab AS (SELECT DISTINCT w FROM t),
      |vs AS (SELECT count(*) AS v FROM vocab),
      |cls AS (SELECT lang AS cl, count(*) AS dc FROM documents
      |  GROUP BY 1),
      |dn AS (SELECT count(*) AS dn FROM documents),
      |lp AS (SELECT vocab.w, cls.cl,
      |    CAST(round(ln(
      |      CAST(coalesce(wc.cnt, 0) + 1 AS DOUBLE)
      |      / CAST(tot.tot + vs.v AS DOUBLE)) * 1e9) AS BIGINT) AS t9
      |  FROM vocab CROSS JOIN cls
      |  LEFT JOIN wc ON wc.w = vocab.w AND wc.cl = cls.cl
      |  JOIN tot ON tot.cl = cls.cl CROSS JOIN vs),
      |pri AS (SELECT cl, CAST(round(ln(CAST(dc AS DOUBLE)
      |    / CAST(dn AS DOUBLE)) * 1e9) AS BIGINT) AS p9 FROM cls, dn),
      |sc AS (SELECT t.doc_id, t.lang, lp.cl,
      |    CAST(sum(lp.t9) AS BIGINT) AS s9
      |  FROM t JOIN lp ON lp.w = t.w GROUP BY 1, 2, 3),
      |fin AS (SELECT doc_id, lang, cl, s9 + p9 AS score
      |  FROM sc JOIN pri USING (cl)),
      |best AS (SELECT doc_id, lang, cl,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, cl) AS rk FROM fin)
      |SELECT lang AS label, cl AS pred, count(*) AS n
      |FROM best WHERE rk = 1 GROUP BY 1, 2
      |ORDER BY label, pred""".stripMargin

  /** c-TF-IDF top-5 distinctive terms per source
    * ([[graft.operators.Search.cTfIdfTopTerms]], the BERTopic
    * topic-description kernel): which words characterize each
    * source's documents, from one (class, term) aggregation + a
    * vocabulary marginal — the per-domain corpus-understanding pass.
    * Scores round to 6 before ranking; ties break on the term. */
  def qCtfidf(s: SparkSession, dir: String): DataFrame =
    graft.operators.Search.cTfIdfTopTerms(
        Tables.documents(s, dir), "source", "text", k = 5)
      .orderBy(col("class"), col("rank"))

  val qCtfidfSql: String =
    """WITH w AS (SELECT source AS class,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT class, term, count(*) AS tf FROM w GROUP BY 1, 2),
      |ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ft FROM tf GROUP BY 1),
      |aa AS (SELECT CAST(sum(tf) AS DOUBLE)
      |    / count(DISTINCT class) AS a FROM tf),
      |sc AS (SELECT tf.class, tf.term, tf.tf,
      |    round(CAST(tf.tf AS DOUBLE) * ln(1.0 + a / CAST(ft AS DOUBLE)),
      |      6) AS score6
      |  FROM tf JOIN ft USING (term) CROSS JOIN aa),
      |r AS (SELECT class, term, tf, score6,
      |    CAST(row_number() OVER (PARTITION BY class
      |      ORDER BY score6 DESC, term) AS INT) AS rank
      |  FROM sc)
      |SELECT class, rank, term, tf, score6 FROM r WHERE rank <= 5
      |ORDER BY class, rank""".stripMargin

  /** Per-label precision / recall / F1 of the nearest-centroid
    * classifier ([[graft.operators.Eval.classificationReport]] over
    * the gated q_centroid_classify confusion counts): the scorecard
    * derived entirely from exact integers — only the final divisions
    * are doubles, so the gate hash-checks every metric. */
  def qClassifyF1(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.classificationReport(centroidConfStaged(s, dir))
      .orderBy(col("label"))

  val qClassifyF1Sql: String =
    """WITH m AS (SELECT vec_id, label, i AS p,
      |    CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1e6) AS BIGINT)
      |      AS v
      |  FROM embeddings, unnest(range(len(embedding))) AS t(i)),
      |cent AS (SELECT label AS cl, p,
      |    CAST(FLOOR(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
      |  FROM m GROUP BY label, p),
      |dist AS (SELECT m.vec_id, m.label, cent.cl,
      |    CAST(sum((m.v - cent.cv) * (m.v - cent.cv)) AS BIGINT) AS d
      |  FROM m JOIN cent ON m.p = cent.p
      |  GROUP BY m.vec_id, m.label, cent.cl),
      |best AS (SELECT vec_id, label, cl,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rk
      |  FROM dist),
      |conf AS (SELECT label, cl AS pred, count(*) AS n
      |  FROM best WHERE rk = 1 GROUP BY label, cl),
      |sup AS (SELECT label, CAST(sum(n) AS BIGINT) AS support
      |  FROM conf GROUP BY 1),
      |pt AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS predicted
      |  FROM conf GROUP BY 1),
      |tp AS (SELECT label, CAST(sum(n) AS BIGINT) AS tp
      |  FROM conf WHERE label = pred GROUP BY 1),
      |j AS (SELECT s.label, s.support,
      |    coalesce(pt.predicted, 0) AS predicted,
      |    coalesce(tp.tp, 0) AS tp
      |  FROM sup s LEFT JOIN pt ON pt.label = s.label
      |    LEFT JOIN tp ON tp.label = s.label)
      |SELECT label, support, predicted, tp,
      |  round(CASE WHEN predicted = 0 THEN 0.0
      |    ELSE CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE) END, 6)
      |    + 0.0 AS precision,
      |  round(CAST(tp AS DOUBLE) / CAST(support AS DOUBLE), 6)
      |    + 0.0 AS recall,
      |  round(CASE WHEN predicted = 0 OR tp = 0 THEN 0.0
      |    ELSE 2.0 * (CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE))
      |      * (CAST(tp AS DOUBLE) / CAST(support AS DOUBLE))
      |      / (CAST(tp AS DOUBLE) / CAST(predicted AS DOUBLE)
      |        + CAST(tp AS DOUBLE) / CAST(support AS DOUBLE)) END, 6)
      |    + 0.0 AS f1
      |FROM j ORDER BY label""".stripMargin

  // --- hybrid retrieval + importance resampling ----------------------

  /** Hybrid retrieval under the gate: a lexical BM25 leg
    * ([[graft.operators.Search.bm25TopK]], the q_fulltext_rank terms)
    * and a dense cosine leg (exact top-20 neighbors of vector 0 via
    * [[Similarity.bruteForceTopK]], the q_ann_topk kernel) fused by
    * reciprocal rank ([[graft.operators.Search.rrfFuse]], k0 = 60) —
    * the standard two-tower retrieval stack over one corpus whose
    * documents and embeddings share ids. Each leg keeps its own plan
    * shape (BM25: one scan + broadcast stats + top-k heap; cosine:
    * broadcast probe + top-k heap); fusion joins two 20-row lists.
    * Per-leg ranks ride along (0 = absent from that leg). */
  def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    // Rank the 20-row lexical list on the TopKPerGroup heap (constant
    // group) rather than an unpartitioned Window — same row_number
    // semantics, k rows of state, no global-window operator.
    val lex = graft.plans.TopKPerGroup.topKSorted(
        graft.operators.Search.bm25TopK(
            Tables.documents(s, dir), "doc_id", "text",
            terms = Seq("hash", "merge", "scan"), k = 20)
          .withColumn("_g", lit(1)),
        Seq("_g"), Seq("score_r6" -> false, "doc_id" -> true), 20,
        rankName = "rank")
      .select(col("doc_id"), col("rank"))
    val den = Similarity.bruteForceTopK(embCorpus(s, dir),
        Tables.embeddings(s, dir).where(col("vec_id") === 0)
          .select(col("vec_id"), col("embedding")), k = 20)
      .select(col("nid").as("doc_id"), col("rank"))
    graft.operators.Search.rrfFuse(Seq(lex, den), "doc_id", "rank",
        k0 = 60, topK = 10)
      .withColumnRenamed("rank_0", "bm25_rank")
      .withColumnRenamed("rank_1", "cos_rank")
  }

  val qHybridRrfSql: String =
    s"""WITH ${DslQueries.bm25OracleCtes(Seq("hash", "merge", "scan"))},
       |lex0 AS (SELECT doc_id, round(score, 6) AS sr FROM scored
       |  WHERE score > 0.0 ORDER BY score DESC, doc_id LIMIT 20),
       |lex AS (SELECT doc_id, CAST(row_number() OVER
       |    (ORDER BY sr DESC, doc_id) AS BIGINT) AS lr FROM lex0),
       |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
       |sden AS (SELECT e.vec_id AS doc_id,
       |    list_inner_product(qe, e.embedding::DOUBLE[]) /
       |    (sqrt(list_inner_product(qe, qe)) *
       |     sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS sim
       |  FROM q, embeddings e WHERE e.vec_id != 0),
       |den AS (SELECT doc_id, dr FROM (
       |    SELECT doc_id, CAST(row_number() OVER
       |      (ORDER BY sim DESC, doc_id) AS BIGINT) AS dr FROM sden)
       |  WHERE dr <= 20),
       |f AS (SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id, lr, dr
       |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
       |SELECT doc_id,
       |  round(coalesce(1.0 / (60.0 + lr), 0.0)
       |      + coalesce(1.0 / (60.0 + dr), 0.0), 6) + 0.0 AS rrf_r6,
       |  CAST(coalesce(lr, 0) AS BIGINT) AS bm25_rank,
       |  CAST(coalesce(dr, 0) AS BIGINT) AS cos_rank
       |FROM f
       |ORDER BY coalesce(1.0 / (60.0 + lr), 0.0)
       |       + coalesce(1.0 / (60.0 + dr), 0.0) DESC, doc_id
       |LIMIT 10""".stripMargin

  /** DSIR importance resampling under the gate
    * ([[Corpus.dsirWeights]]): target = the English documents; every
    * document's hashed-token bag (256 md5 buckets) is scored by the
    * smoothed target-vs-corpus log-likelihood ratio and the 100
    * highest-weight documents form the resampled subset. Weights are
    * exact nano-nat integers (each ln quantized BEFORE summation —
    * the q_entropy discipline), so the oracle's explode-join replay
    * matches bit-for-bit while the engine side never materializes
    * the (doc × bucket) table: scoring is one codegen'd pass per
    * document against the broadcast 256-entry llr array. */
  def qDsir(s: SparkSession, dir: String): DataFrame =
    Corpus.dsirWeights(Tables.documents(s, dir), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 256)
      .orderBy(col("weight_nano").desc, col("doc_id"))
      .limit(100)

  val qDsirSql: String =
    """WITH w AS (SELECT doc_id, lang = 'en' AS t,
      |    unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents),
      |b AS (SELECT doc_id, t,
      |    try_cast('0x' || substr(md5(w), 1, 15) AS BIGINT) % 256 AS b FROM w),
      |pb AS (SELECT b, count(*) AS cr,
      |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
      |    CAST(sum(ct) AS BIGINT) AS nt FROM pb),
      |g AS (SELECT b,
      |    CAST(round(ln((ct + 1.0) / (nt + 256.0)) * 1e9) AS BIGINT)
      |  - CAST(round(ln((cr + 1.0) / (nr + 256.0)) * 1e9) AS BIGINT) AS llr
      |  FROM pb, tot),
      |ws AS (SELECT b.doc_id, CAST(sum(g.llr) AS BIGINT) AS weight_nano
      |  FROM b JOIN g USING (b) GROUP BY 1)
      |SELECT doc_id, weight_nano FROM ws
      |ORDER BY weight_nano DESC, doc_id LIMIT 100""".stripMargin

  /** INCREMENTAL DSIR maintenance under the gate: the corpus splits
    * into a stored base (doc_id % 5 ≠ 0, at scale: a persisted stats
    * table, never re-tokenized) and a delta batch; each side
    * contributes only its own per-bucket sufficient statistics
    * ([[Corpus.dsirStats]]) and the store merges them by addition
    * ([[Corpus.dsirMergeStats]]). Because counts are exact
    * sufficient statistics, the merged llr table — and every
    * document weight scored against it — is BIT-IDENTICAL to the
    * batch recompute, so the oracle is [[qDsirSql]] itself (the
    * q_dedup_incr equality-to-batch discipline). What the gate pins:
    * arriving data shifts every existing document's weight through
    * the shared llr table, and the maintenance form tracks that
    * exactly while touching only the delta's tokens. */
  def qDsirIncr(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val isTarget = col("lang") === "en"
    val merged = Corpus.dsirMergeStats(
      Corpus.dsirStats(base, "text", isTarget, 256),
      Corpus.dsirStats(delta, "text", isTarget, 256))
    Corpus.dsirWeightsFromStats(docs, "doc_id", "text", merged, 256)
      .orderBy(col("weight_nano").desc, col("doc_id"))
      .limit(100)
  }

  val qDsirIncrSql: String = qDsirSql

  // --- corpus-health + annotation-quality measurement gates ------------

  /** Corpus BLEU-2 per source ([[graft.operators.Eval.corpusBleu]]):
    * every document scored as a candidate against the NEXT document of
    * its source (lead over (source, doc_id) — a deterministic aligned
    * pairing both engines replay), clipped matches and lengths summed
    * per source before the precision divisions. The fixture's shared
    * 31-term vocabulary gives real n-gram overlap (p1 ≈ 0.5–0.7,
    * p2 well below p1 — clipping and the bigram order sensitivity both
    * discriminate), and per-source length imbalance makes the brevity
    * penalty fire on some sources and not others. */
  def qBleu(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val pairs = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("text"),
        lead(col("text"), 1).over(bySrc).as("ref"))
      .where(col("ref").isNotNull)
    graft.operators.Eval.corpusBleu(pairs, "source", "doc_id", "text", "ref")
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  val qBleuSql: String =
    """WITH p AS (SELECT source, text AS cand,
      |    lead(text) OVER (PARTITION BY source ORDER BY doc_id) AS ref
      |  FROM documents),
      |t AS (SELECT source, string_split(cand, ' ') AS ca,
      |    string_split(ref, ' ') AS ra
      |  FROM p WHERE ref IS NOT NULL),
      |g AS (SELECT source, ca, ra,
      |    CASE WHEN len(ca) >= 2 THEN list_transform(range(1, len(ca)),
      |      i -> ca[i] || ' ' || ca[i+1]) ELSE [] END AS cb,
      |    CASE WHEN len(ra) >= 2 THEN list_transform(range(1, len(ra)),
      |      i -> ra[i] || ' ' || ra[i+1]) ELSE [] END AS rb
      |  FROM t),
      |pp AS (SELECT source,
      |    coalesce(list_sum(list_transform(list_distinct(ca), w ->
      |      least(len(list_filter(ca, x -> x = w)),
      |            len(list_filter(ra, x -> x = w))))), 0) AS c1,
      |    len(ca) AS t1,
      |    coalesce(list_sum(list_transform(list_distinct(cb), w ->
      |      least(len(list_filter(cb, x -> x = w)),
      |            len(list_filter(rb, x -> x = w))))), 0) AS c2,
      |    greatest(len(ca) - 1, 0) AS t2,
      |    len(ca) AS clen, len(ra) AS rlen
      |  FROM g),
      |a AS (SELECT source, sum(c1) AS c1, sum(t1) AS t1, sum(c2) AS c2,
      |    sum(t2) AS t2, sum(clen) AS clen, sum(rlen) AS rlen
      |  FROM pp GROUP BY source)
      |SELECT source,
      |  round(c1 / CAST(t1 AS DOUBLE), 6) + 0.0 AS p1,
      |  round(CASE WHEN t2 > 0 THEN c2 / CAST(t2 AS DOUBLE)
      |    ELSE 0.0 END, 6) + 0.0 AS p2,
      |  round(CASE WHEN clen >= rlen THEN 1.0
      |    ELSE exp(1.0 - rlen / CAST(clen AS DOUBLE)) END, 6) + 0.0 AS bp,
      |  round(CASE WHEN clen >= rlen THEN 1.0
      |      ELSE exp(1.0 - rlen / CAST(clen AS DOUBLE)) END
      |    * sqrt((c1 / CAST(t1 AS DOUBLE))
      |      * (CASE WHEN t2 > 0 THEN c2 / CAST(t2 AS DOUBLE)
      |         ELSE 0.0 END)),
      |    6) + 0.0 AS bleu
      |FROM a ORDER BY source""".stripMargin

  /** Fleiss' kappa over a rating log derived from `events`
    * ([[graft.operators.Eval.fleissKappa]]): item = user_id % 50,
    * category 80% item-determined consensus / 20% event-determined
    * noise — kappa lands mid-range (≈ 0.55 at sf0.01), well off both
    * the 0 (chance) and 1 (unanimity) degeneracies, so the
    * chance-correction arithmetic is load-bearing, not decorative. */
  def qKappa(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.fleissKappa(
      Tables.events(s, dir).select(
        concat(lit("u"), col("user_id") % 50).as("item"),
        concat(lit("c"),
          when(col("event_id") % 10 < 8, (col("user_id") % 50) % 3)
            .otherwise(col("event_id") % 3)).as("cat")),
      "item", "cat")

  val qKappaSql: String =
    """WITH r AS (SELECT 'u' || (user_id % 50) AS it,
      |    'c' || (CASE WHEN event_id % 10 < 8 THEN (user_id % 50) % 3
      |                 ELSE event_id % 3 END) AS cat
      |  FROM events),
      |nij AS (SELECT it, cat, count(*) AS n FROM r GROUP BY it, cat),
      |pi AS (SELECT it, sum(n) AS ni,
      |    sum(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS agr
      |  FROM nij GROUP BY it),
      |pb AS (SELECT count(*) AS n_items,
      |    avg(agr / (CAST(ni AS DOUBLE) * CAST(ni - 1 AS DOUBLE))) AS pbar
      |  FROM pi WHERE ni >= 2),
      |pj AS (SELECT cat, sum(n) AS nj FROM nij GROUP BY cat),
      |pe AS (SELECT CAST(sum(nj) AS BIGINT) AS n_ratings,
      |    sum(CAST(nj AS DOUBLE) * CAST(nj AS DOUBLE))
      |      / (CAST(sum(nj) AS DOUBLE) * CAST(sum(nj) AS DOUBLE)) AS pe
      |  FROM pj)
      |SELECT n_items, n_ratings,
      |  round(pbar, 6) + 0.0 AS p_bar,
      |  round(pe, 6) + 0.0 AS p_e,
      |  CASE WHEN pe < 1.0
      |    THEN round((pbar - pe) / (1.0 - pe), 6) + 0.0 END AS kappa
      |FROM pb CROSS JOIN pe""".stripMargin

  /** Calibration reliability table
    * ([[graft.operators.Eval.calibrationBins]]) of a synthetic scorer
    * whose accuracy tracks ≈ 0.8·conf + 0.1 — systematically
    * UNDER-confident below 0.5 and OVER-confident above it, so every
    * bin's |acc − conf| gap (and the summed ECE) is non-trivial and
    * sign-varying. Confidence and hit are exact integer-derived
    * expressions both engines replay; the threshold division is true
    * division on both sides (no floor-boundary coupling). */
  def qCalibration(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.calibrationBins(
      Tables.events(s, dir).select(
        ((col("event_id") % 100).cast("double") / lit(100.0) + lit(0.005))
          .as("conf"),
        ((col("event_id") * 31 + col("user_id") * 17) % 100 <
          (lit(8) * (col("event_id") % 100) + lit(104)) / lit(10.0))
          .as("hit")),
      "conf", "hit", bins = 10)
      .orderBy(col("bin"))

  val qCalibrationSql: String =
    """WITH s AS (SELECT (event_id % 100) / 100.0 + 0.005 AS conf,
      |    CASE WHEN (event_id * 31 + user_id * 17) % 100 <
      |      (8 * (event_id % 100) + 104) / 10.0 THEN 1 ELSE 0 END AS h
      |  FROM events),
      |b AS (SELECT least(CAST(floor(conf * 10) AS INT), 9) AS bin,
      |    conf, h FROM s),
      |a AS (SELECT bin, count(*) AS n, sum(conf) AS csum, sum(h) AS hits
      |  FROM b GROUP BY bin),
      |t AS (SELECT sum(n) AS nt FROM a)
      |SELECT bin, CAST(n AS BIGINT) AS n,
      |  round(csum / n, 6) + 0.0 AS conf,
      |  round(CAST(hits AS DOUBLE) / n, 6) + 0.0 AS acc,
      |  round(CAST(n AS DOUBLE) / nt
      |    * abs(CAST(hits AS DOUBLE) / n - csum / n), 6) + 0.0 AS contrib
      |FROM a CROSS JOIN t ORDER BY bin""".stripMargin

  /** Alignment + uniformity of the embedding column
    * ([[graft.operators.Eval.alignmentUniformity]]): positives =
    * same-label id-consecutive pairs (the label structure IS the
    * fixture's notion of "same thing"), uniformity over the fixed
    * vec_id < 50 prefix — a CONSTANT-sized sample at any corpus
    * scale, so the quadratic term never grows. The fixture reads
    * alignment ≈ uniformity-scale distances (labels are not tight
    * clusters), which is exactly what the gate should say about
    * near-random embeddings. */
  def qAlignUniform(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val byLabel = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    val pos = emb.select(col("vec_id").as("aid"),
        lead(col("vec_id"), 1).over(byLabel).as("bid"))
      .where(col("bid").isNotNull)
    graft.operators.Eval.alignmentUniformity(
      emb.select(col("vec_id"), col("embedding")),
      pos,
      emb.filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding")))
  }

  val qAlignUniformSql: String =
    """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |pos AS (SELECT aid, bid FROM (
      |    SELECT vec_id AS aid, lead(vec_id) OVER (PARTITION BY label
      |      ORDER BY vec_id) AS bid FROM v) WHERE bid IS NOT NULL),
      |pj AS (SELECT 2.0 - 2.0 * (list_inner_product(a.e, b.e) /
      |    (sqrt(list_inner_product(a.e, a.e)) *
      |     sqrt(list_inner_product(b.e, b.e)))) AS d2
      |  FROM pos JOIN v a ON pos.aid = a.vec_id
      |    JOIN v b ON pos.bid = b.vec_id),
      |al AS (SELECT CAST(count(*) AS BIGINT) AS n_pos,
      |    avg(d2) AS alignment FROM pj),
      |sv AS (SELECT vec_id, e FROM v WHERE vec_id < 50),
      |up AS (SELECT 2.0 - 2.0 * (list_inner_product(a.e, b.e) /
      |    (sqrt(list_inner_product(a.e, a.e)) *
      |     sqrt(list_inner_product(b.e, b.e)))) AS d2
      |  FROM sv a JOIN sv b ON a.vec_id < b.vec_id),
      |un AS (SELECT CAST(count(*) AS BIGINT) AS n_unif,
      |    ln(avg(exp(-2.0 * d2))) AS uniformity FROM up)
      |SELECT n_pos, n_unif,
      |  round(alignment, 6) + 0.0 AS alignment,
      |  round(uniformity, 6) + 0.0 AS uniformity
      |FROM al CROSS JOIN un""".stripMargin

  /** Exact quantized-score ROC AUC ([[graft.operators.Eval
    * .aucFromLevels]]) of the calibration fixture's scorer against its
    * own outcomes — the ranking-quality companion to q_calibration's
    * probability-quality table (same scorer, same outcome derivation,
    * the two halves of "can I trust this classifier's scores"). The
    * fixture's acc ≈ 0.8·conf + 0.1 design makes the scorer genuinely
    * discriminative but far from perfect (AUC lands mid 0.7s), so the
    * tie-corrected Mann–Whitney arithmetic is load-bearing across all
    * 100 score levels. */
  def qAuc(s: SparkSession, dir: String): DataFrame =
    graft.operators.Eval.aucFromLevels(
      Tables.events(s, dir).select(
        (col("event_id") % 100).as("level"),
        ((col("event_id") * 31 + col("user_id") * 17) % 100 <
          (lit(8) * (col("event_id") % 100) + lit(104)) / lit(10.0))
          .as("hit")),
      "level", "hit")

  val qAucSql: String =
    """WITH s AS (SELECT event_id % 100 AS lv,
      |    CASE WHEN (event_id * 31 + user_id * 17) % 100 <
      |      (8 * (event_id % 100) + 104) / 10.0 THEN 1 ELSE 0 END AS h
      |  FROM events),
      |pl AS (SELECT lv, CAST(sum(h) AS BIGINT) AS np,
      |    CAST(sum(1 - h) AS BIGINT) AS nn
      |  FROM s GROUP BY lv),
      |cb AS (SELECT np, nn, coalesce(sum(nn) OVER (ORDER BY lv
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      |  FROM pl),
      |u AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
      |    CAST(sum(nn) AS BIGINT) AS n_neg,
      |    sum(CAST(np AS DOUBLE) * CAST(below AS DOUBLE)
      |      + 0.5 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS u
      |  FROM cb)
      |SELECT n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0
      |    THEN round(u / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
      |      + 0.0 END AS auc
      |FROM u""".stripMargin

  /** Zipf rank–frequency fit over the corpus
    * ([[graft.operators.Corpus.zipfFit]]): all 31 vocabulary types
    * ranked by frequency, log–log OLS slope/intercept/r² in one row.
    * The synthetic corpus is near-uniform (slope ≈ −0.05, r² ≈ 0.5)
    * — far from natural text's −1, which is exactly what the gate
    * should report; the fixture exercises the estimator, the verdict
    * belongs to real corpora. */
  def qZipf(s: SparkSession, dir: String): DataFrame =
    Corpus.zipfFit(Tables.documents(s, dir), "text", maxRanks = 1000)

  /** Heaps' law vocabulary-growth curve
    * ([[graft.operators.Corpus.heapsCurve]]): cumulative docs /
    * tokens / vocabulary at id-space decile checkpoints plus the
    * V = K·N^β fit. The fixture's closed 31-type vocabulary saturates
    * in the first decile — β ≈ 0, exactly what a curve gate should
    * say about a corpus that stopped growing its vocabulary (natural
    * web text runs β ≈ 0.5). The integer curve is exact on both
    * engines; the id→bucket map is one broadcast scalar away from a
    * pure per-row function, so no corpus-sized ordering exists. */
  def qHeaps(s: SparkSession, dir: String): DataFrame =
    Corpus.heapsCurve(Tables.documents(s, dir), "doc_id", "text")

  val qZipfSql: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT term, count(*) AS f FROM t GROUP BY term
      |  ORDER BY f DESC, term LIMIT 1000),
      |rk AS (SELECT row_number() OVER (ORDER BY f DESC, term) AS r, f
      |  FROM tf),
      |xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
      |    ln(CAST(f AS DOUBLE)) AS y FROM rk),
      |sm AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
      |    sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
      |    sum(x * y) AS sxy FROM xy)
      |SELECT CAST(n AS BIGINT) AS n_types,
      |  round(CASE WHEN n * sxx - sx * sx > 0
      |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
      |    + 0.0 AS slope,
      |  round(CASE WHEN n * sxx - sx * sx > 0 THEN
      |    (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END, 6)
      |    + 0.0 AS intercept,
      |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |    THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
      |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
      |    + 0.0 AS r2
      |FROM sm""".stripMargin

  /** The staged BPE merge table (8 rounds over the corpus vocabulary)
    * — one training run per (session, dir), shared by the train and
    * encode gates; at 100 TB this IS the shipped tokenizer artifact. */
  private def bpeMergesStaged(s: SparkSession, dir: String): DataFrame =
    graft.Staging.stage(s, s"bpe:merges:$dir") {
      Corpus.bpeTrain(Tables.documents(s, dir), "text", nMerges = 8)
    }

  /** BPE training under the gate ([[Corpus.bpeTrain]]): 8 merge
    * rounds over the word-frequency table. The oracle replays every
    * round — pair counting (overlaps included), the (count desc,
    * left, right) argmax, and the leftmost-first fold — as 8 unrolled
    * CTE stages whose fold is a list_reduce with a string
    * accumulator, so the merge TABLE (not just counts) is
    * hash-checked. */
  def qBpeTrain(s: SparkSession, dir: String): DataFrame =
    bpeMergesStaged(s, dir).orderBy(col("rank"))

  /** BPE encoding under the gate ([[Corpus.bpeSegment]]): every
    * vocabulary word segmented under the staged merge list (applied
    * in rank order as literals inside ONE vocab-sized projection —
    * encoding a corpus is one scan). The 8-row collect is the
    * PQ-codebook boundedness discipline. */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val ms = bpeMergesStaged(s, dir).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    Corpus.bpeSegment(Tables.documents(s, dir), "text", ms)
      .orderBy(col("w"))
  }

  /** Tokenizer fertility per source under the staged merges
    * ([[Corpus.bpeFertility]]): tokens-per-word and chars-per-token —
    * the compression scorecard of the trained tokenizer, per domain.
    * At the fixture's 8 merges fertility sits between 1 (everything
    * merged) and chars-per-word (nothing merged), with real
    * per-source spread from the source-skewed word mix. */
  def qBpeFertility(s: SparkSession, dir: String): DataFrame = {
    val ms = bpeMergesStaged(s, dir).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    Corpus.bpeFertility(Tables.documents(s, dir), "source", "text", ms)
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))
  }

  /** The shared BPE CTE chain: v0/s0 (vocab + char segmentation, a
    * chr(1) seam no token carries), then per round i: p_i (pair
    * counts from the segmentation), m_i (the argmax merge), s_i (the
    * fold applying it) — the exact [[Corpus.bpeTrain]] loop unrolled.
    * s_i joins its merge with LEFT JOIN ON true: a round past merge
    * exhaustion (empty m_i) passes the segmentation through unchanged
    * instead of emptying every later stage — mirroring the trainer's
    * early stop. */
  private def bpeStagesSql(n: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH v0 AS (SELECT w, count(*) AS wc FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |  WHERE len(w) > 0 GROUP BY w),
             |s0 AS (SELECT w, wc,
             |    array_to_string(list_transform(range(1, len(w) + 1),
             |      i -> w[i]), chr(1)) AS seg FROM v0)""".stripMargin
    for (i <- 1 to n) {
      sb ++= s""",
                |p$i AS (SELECT u.l AS l, u.r AS r, sum(wc) AS c FROM (
                |    SELECT wc, unnest(list_transform(range(1, len(parts)),
                |      j -> {'l': parts[j], 'r': parts[j + 1]})) AS u
                |    FROM (SELECT wc, string_split(seg, chr(1)) AS parts
                |          FROM s${i - 1})) GROUP BY u.l, u.r),
                |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
                |s$i AS (SELECT w, wc,
                |    CASE WHEN l IS NULL THEN seg ELSE
                |    list_reduce(string_split(seg, chr(1)), (acc, x) ->
                |      CASE WHEN (acc = l OR ends_with(acc, chr(1) || l))
                |                AND x = r
                |           THEN CASE WHEN acc = l THEN l || r
                |                ELSE substr(acc, 1, len(acc) - len(l) - 1)
                |                  || chr(1) || l || r END
                |           ELSE acc || chr(1) || x END) END AS seg
                |  FROM s${i - 1} LEFT JOIN m$i ON true)""".stripMargin
    }
    sb.toString
  }

  val qBpeTrainSql: String = {
    val members = (1 to 8).map(i =>
      s"""SELECT $i AS rank, l AS "left", r AS "right", l || r AS merged,
         |  CAST(c AS BIGINT) AS pair_count FROM m$i""".stripMargin)
    bpeStagesSql(8) + "\n" +
      members.mkString("\nUNION ALL\n") + "\nORDER BY rank"
  }

  val qBpeEncodeSql: String =
    bpeStagesSql(8) +
      """
        |SELECT w, CAST(wc AS BIGINT) AS wc,
        |  replace(seg, chr(1), ' ') AS tokens
        |FROM s8 ORDER BY w""".stripMargin

  val qBpeFertilitySql: String =
    bpeStagesSql(8) +
      """,
        |gw AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |gc AS (SELECT source, w, count(*) AS c FROM gw
        |  WHERE len(w) > 0 GROUP BY source, w),
        |j AS (SELECT source, c,
        |    len(string_split(seg, chr(1))) AS ntok, len(w) AS nchr
        |  FROM gc JOIN s8 USING (w))
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_words,
        |  CAST(sum(c * ntok) AS BIGINT) AS n_tokens,
        |  round(sum(c * ntok) / CAST(sum(c) AS DOUBLE), 6) + 0.0
        |    AS fertility,
        |  round(sum(c * nchr) / CAST(sum(c * ntok) AS DOUBLE), 6) + 0.0
        |    AS chars_per_token
        |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** Token-mass coverage at k ∈ {1, 2, 5, 10, 20}
    * ([[Corpus.coverageCurve]]) — on the near-uniform fixture the
    * top type covers ~4% and the top 20 ~70%, real spread for the
    * cumulative arithmetic; natural text's 40-50%-at-10 signature is
    * what the gate reports on real corpora. */
  def qCoverage(s: SparkSession, dir: String): DataFrame =
    Corpus.coverageCurve(Tables.documents(s, dir), "text",
      ks = Seq(1, 2, 5, 10, 20))

  val qCoverageSql: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT term, count(*) AS f FROM t GROUP BY term),
      |tot AS (SELECT CAST(sum(f) AS BIGINT) AS tt FROM tf),
      |head AS (SELECT term, f FROM tf ORDER BY f DESC, term LIMIT 20),
      |rk AS (SELECT CAST(row_number() OVER (ORDER BY f DESC, term) AS INT)
      |    AS k, f FROM head),
      |cm AS (SELECT k, CAST(sum(f) OVER (ORDER BY k
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mass FROM rk)
      |SELECT k, mass,
      |  round(CAST(mass AS DOUBLE) / CAST(tt AS DOUBLE), 6) + 0.0 AS share
      |FROM cm CROSS JOIN tot
      |WHERE k IN (1, 2, 5, 10, 20) ORDER BY k""".stripMargin

  val qHeapsSql: String =
    """WITH sp AS (SELECT max(doc_id) + 1 AS span FROM documents),
      |pd AS (SELECT CAST(floor(doc_id * 10 / span) AS INT) + 1 AS b,
      |    count(*) AS nd, sum(len(string_split(text, ' '))) AS nt
      |  FROM documents CROSS JOIN sp GROUP BY 1),
      |fs AS (SELECT term, min(doc_id) AS fd FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |    FROM documents) GROUP BY term),
      |fv AS (SELECT CAST(floor(fd * 10 / span) AS INT) + 1 AS b,
      |    count(*) AS nv
      |  FROM fs CROSS JOIN sp GROUP BY 1),
      |cv AS (SELECT pd.b AS decile,
      |    CAST(sum(pd.nd) OVER wc AS BIGINT) AS docs_cum,
      |    CAST(sum(pd.nt) OVER wc AS BIGINT) AS tokens_cum,
      |    CAST(sum(coalesce(fv.nv, 0)) OVER wc AS BIGINT) AS vocab_cum
      |  FROM pd LEFT JOIN fv USING (b)
      |  WINDOW wc AS (ORDER BY pd.b ROWS UNBOUNDED PRECEDING)),
      |xy AS (SELECT decile, docs_cum, tokens_cum, vocab_cum,
      |    ln(CAST(tokens_cum AS DOUBLE)) AS x,
      |    ln(CAST(vocab_cum AS DOUBLE)) AS y FROM cv),
      |f AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
      |    sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy FROM xy)
      |SELECT decile, docs_cum, tokens_cum, vocab_cum,
      |  round(CASE WHEN n * sxx - sx * sx > 0
      |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
      |    + 0.0 AS beta,
      |  round(CASE WHEN n * sxx - sx * sx > 0 THEN
      |    exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n)
      |    END, 6) + 0.0 AS k
      |FROM xy CROSS JOIN f ORDER BY decile""".stripMargin
}
