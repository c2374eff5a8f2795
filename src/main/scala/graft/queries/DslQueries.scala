package graft.queries

import graft.Tables
import graft.dsl.{Compile, Query}
import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The iDigBio Query Format wired end-to-end: every query here is a JSON
  * DSL string → [[graft.dsl.Query.parse]] → [[graft.dsl.Compile]] →
  * `df.filter(column)`, checked against a hand-written DuckDB oracle.
  *
  * This is the reference's flagship path (queryFromShim,
  * idigbio_workers/lib/query_shim.py:181-197): every search, count, and
  * download goes through it.
  *
  * The geo queries run over a geopoint view derived arithmetically from
  * `supplier` (integer-modular lat/lon at 0.01° granularity), so the
  * oracle can mirror the exact doubles with no float-parsing ambiguity.
  */
object DslQueries {

  /** lat/lon derived from s_suppkey with exact integer arithmetic. */
  private def geoView(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .withColumn("lat", (col("s_suppkey") * 7919 % 18000) / 100.0 - 90.0)
      .withColumn("lon", (col("s_suppkey") * 104729 % 36000) / 100.0 - 180.0)

  private val geoViewSql =
    """SELECT s_suppkey,
      |  (s_suppkey * 7919 % 18000) / 100.0 - 90.0 AS lat,
      |  (s_suppkey * 104729 % 36000) / 100.0 - 180.0 AS lon
      |FROM supplier""".stripMargin

  private val geoOpts =
    Compile.Options(geoFields = Map("geopoint" -> ("lat", "lon")))

  /** The Z-order (Morton) value under the driver gate: the spatial
    * clustering key behind [[graft.store.Layout.writeZOrdered]],
    * computed over the supplier geopoint view at 8 bits/coordinate and
    * replayed bit-for-bit in SQL (quantize, spread, interleave are all
    * integer arithmetic; the float quantization path is the same
    * multiply-divide order on both engines). Gate = the layout's sort
    * key itself is exact, not just "some clustering happened". */
  def qZorder(s: SparkSession, dir: String): DataFrame =
    geoView(s, dir)
      .select(col("s_suppkey"),
        graft.store.Layout.zValue(col("lat"), col("lon"), bits = 8).as("z"))
      .orderBy(col("z"), col("s_suppkey"))

  val qZorderSql: String = {
    def spread(v: String): String =
      (0 until 8).map(k => s"((($v >> $k) & 1) << ${2 * k})").mkString(" + ")
    s"""WITH g AS ($geoViewSql),
       |q AS (SELECT s_suppkey,
       |  CAST(LEAST(FLOOR((lat + 90.0) / 180.0 * 256.0), 255) AS BIGINT) AS iy,
       |  CAST(LEAST(FLOOR((lon + 180.0) / 360.0 * 256.0), 255) AS BIGINT) AS ix
       |  FROM g)
       |SELECT s_suppkey, (${spread("ix")}) + 2 * (${spread("iy")}) AS z
       |FROM q ORDER BY z, s_suppkey""".stripMargin
  }

  /** The GeohashPruning optimizer rule under the driver gate, end to
    * end over a REAL partitioned lake: an events-derived geopoint set
    * is written `.partitionBy("ghash1")` (the
    * [[graft.plans.GeohashPruning]] naming contract), read back, and
    * bbox-filtered — the rule conjoins the covering-cell IN and the
    * scan prunes to the box's partitions (the plan-shape/partition-
    * count assertions live in GeohashPruningSpec; this row gates that
    * the pruned read returns EXACTLY the unpruned answer). Aggregates
    * are integer-only (count, id sum, quantized-coordinate sum) so
    * cross-engine float summation order can't wobble the hash. */
  def qGeohashPrune(s: SparkSession, dir: String): DataFrame = {
    // FIXED per-(jvm,sf) path, overwritten each call: a fresh temp dir
    // per invocation would leak one lake copy per Verify/Bench/stress
    // run until the host fills
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_ghlake_${Integer.toHexString(dir.hashCode)}/lake"
    Tables.events(s, dir).select(
        col("event_id"),
        ((col("event_id") * 7919 % 18000) / 100.0 - 90.0).as("lat"),
        ((col("event_id") * 104729 % 36000) / 100.0 - 180.0).as("lon"))
      .withColumn("ghash1",
        graft.functions.Geohash.geohash(col("lat"), col("lon"), 1))
      .repartition(col("ghash1"))   // one file per cell, not one per task
      .write.mode("overwrite").partitionBy("ghash1").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("lat").between(10.0, 25.0) && col("lon").between(20.0, 40.0))
      .agg(count(lit(1)).as("n"),
        sum(col("event_id")).as("idsum"),
        sum(floor(col("lat") * 100.0).cast("long") +
            floor(col("lon") * 100.0).cast("long")).as("cellsum"))
  }

  val qGeohashPruneSql: String =
    """WITH g AS (SELECT event_id,
      |  (event_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
      |  (event_id * 104729 % 36000) / 100.0 - 180.0 AS lon
      |  FROM events)
      |SELECT count(*) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS idsum,
      |  CAST(sum(CAST(floor(lat * 100.0) AS BIGINT)
      |         + CAST(floor(lon * 100.0) AS BIGINT)) AS BIGINT) AS cellsum
      |FROM g
      |WHERE lat BETWEEN 10.0 AND 25.0 AND lon BETWEEN 20.0 AND 40.0""".stripMargin

  // --- scalar predicates ------------------------------------------------

  /** term: scalar string, lowercased on both sides (query_shim.py:93-105). */
  def qDslTerm(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(Compile.fromJson("""{"c_mktsegment": "Building"}"""))
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))

  val qDslTermSql: String =
    """SELECT c_custkey FROM customer
      |WHERE lower(c_mktsegment) = 'building' ORDER BY c_custkey""".stripMargin

  /** terms OR-list (query_shim.py:108-121). */
  def qDslTerms(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(Compile.fromJson("""{"o_orderpriority": ["1-URGENT", "5-LOW"]}"""))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))

  val qDslTermsSql: String =
    """SELECT o_orderkey FROM orders
      |WHERE lower(o_orderpriority) IN ('1-urgent', '5-low')
      |ORDER BY o_orderkey""".stripMargin

  /** range gt/gte/lt/lte passthrough (query_shim.py:49-50). */
  def qDslRange(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(Compile.fromJson(
        """{"o_totalprice": {"type": "range", "gte": 400000, "lt": 450000}}"""))
      .select(col("o_orderkey"))
      .orderBy(col("o_orderkey"))

  val qDslRangeSql: String =
    """SELECT o_orderkey FROM orders
      |WHERE o_totalprice >= 400000 AND o_totalprice < 450000
      |ORDER BY o_orderkey""".stripMargin

  /** prefix, value lowercased (query_shim.py:53-65). */
  def qDslPrefix(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(Compile.fromJson("""{"p_name": {"type": "prefix", "value": "SM"}}"""))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  val qDslPrefixSql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE lower(p_name) LIKE 'sm%' ORDER BY p_partkey""".stripMargin

  /** exists + missing over a nullable derived column
    * (query_shim.py:23-36). */
  def qDslExistsMissing(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("big_value", when(col("value") > 15.0, col("value")))
    val c = Compile.fromJson("""{"big_value": {"type": "missing"}}""") &&
      Compile.fromJson("""{"event_type": "click"}""")
    ev.filter(c).select(col("event_id")).orderBy(col("event_id"))
  }

  val qDslExistsMissingSql: String =
    """SELECT event_id FROM events
      |WHERE (CASE WHEN value > 15.0 THEN value END) IS NULL
      |  AND lower(event_type) = 'click'
      |ORDER BY event_id""".stripMargin

  /** fulltext: match-_all operator AND — every token must match
    * (query_shim.py:123-133). */
  def qDslFulltext(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(Compile.fromJson(
        """{"text": {"type": "fulltext", "value": "SPARK window merge"}}"""))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val qDslFulltextSql: String =
    """SELECT doc_id FROM documents
      |WHERE list_contains(string_split(lower(text), ' '), 'spark')
      |  AND list_contains(string_split(lower(text), ' '), 'window')
      |  AND list_contains(string_split(lower(text), ' '), 'merge')
      |ORDER BY doc_id""".stripMargin

  /** BM25-ranked fulltext — the relevance-sort half of the reference's
    * search surface (ES scores every search.py hit with BM25 and returns
    * `_score` order; the filter half is qDslFulltext). Constants and
    * idf/tf form in [[graft.operators.Search]]. */
  def qFulltextRank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Search.bm25TopK(
      Tables.documents(s, dir), "doc_id", "text",
      terms = Seq("hash", "merge", "scan"), k = 20)

  /** The BM25 oracle's WITH-body (staged/stats/scored CTEs) for
    * `terms` — factored out so the hybrid-RRF gate's composed oracle
    * reuses the lexical leg's exact fragments (the q_pipeline
    * composed-oracle discipline). */
  private[queries] def bm25OracleCtes(terms: Seq[String]): String = {
    val (k1, b) = (graft.operators.Search.K1, graft.operators.Search.B)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(w) - len(list_filter(w, x -> x != '$t')) AS BIGINT) AS tf_$i"
    }.mkString(",\n  ")
    val dfCols = terms.indices.map(i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(",\n  ")
    val scoreTerms = terms.indices.map { i =>
      s"""(CASE WHEN tf_$i > 0 THEN
         |    ln(1.0 + (CAST(n_docs - df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
         |    * (CAST(tf_$i AS DOUBLE) * ${k1 + 1.0})
         |    / (CAST(tf_$i AS DOUBLE) + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE)
         |        / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         |  ELSE 0.0 END)""".stripMargin
    }.mkString(" +\n  ")
    s"""staged AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |  $tfCols
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |  $dfCols
       |  FROM staged),
       |scored AS (
       |  SELECT doc_id,
       |  $scoreTerms AS score
       |  FROM staged, stats)""".stripMargin
  }

  val qFulltextRankSql: String =
    s"""WITH ${bm25OracleCtes(Seq("hash", "merge", "scan"))}
       |SELECT doc_id, round(score, 6) AS score_r6 FROM scored
       |WHERE score > 0.0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** The inverted-index BUILD ([[graft.operators.Search.invertedPostings]])
    * under the driver gate — the reference's entire pipeline feeds an
    * Elasticsearch inverted index (elasticsearch.py bulk indexer);
    * this is that index as a first-class dataset: one row per
    * (term, doc) with tf, the Lucene-norms-style denormalized doc
    * length, and the term's document frequency joined on. */
  def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val p = graft.operators.Search.invertedPostings(
      Tables.documents(s, dir), "doc_id", "text")
    val dfs = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    p.join(dfs, "term")
      .select(col("term"), col("df"), col("doc_id"), col("tf"), col("dl"))
      .orderBy(col("term"), col("doc_id"))
  }

  val qInvertedIndexSql: String =
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM w),
      |p AS (SELECT term, doc_id, MAX(dl) AS dl, COUNT(*) AS tf
      |      FROM t GROUP BY term, doc_id),
      |d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term)
      |SELECT p.term, df, doc_id, tf, dl FROM p JOIN d USING (term)
      |ORDER BY term, doc_id""".stripMargin

  /** Incremental segment merge under the driver gate — the
    * streaming-ingest half of "build once": the corpus is indexed as
    * two disjoint halves whose segment tables are merged per
    * (term, shard), exactly as a nightly harvest merges its delta into
    * the standing index. The merge algebra (SearchSpec) says the
    * result must equal the whole-corpus index, so the oracle simply
    * builds that index flat — any drift in concat/re-sort goes
    * hash-red. Emitted exploded (term, shard, doc_id, tf, dl) so the
    * gate checks every posting of every segment. */
  def qIndexMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Search
    val docs = Tables.documents(s, dir)
    val half = (m: Int) => Search.invertedSegments(
      Search.invertedPostings(
        docs.filter(col("doc_id") % 2 === m), "doc_id", "text"),
      nShards = 4)
    Search.mergeSegments(half(0), half(1))
      .select(col("term"), col("shard"), explode(col("postings")).as("p"))
      .select(col("term"), col("shard"),
        col("p.doc_id").as("doc_id"), col("p.tf").as("tf"),
        col("p.dl").as("dl"))
      .orderBy(col("term"), col("shard"), col("doc_id"))
  }

  val qIndexMergeSql: String =
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS term FROM w),
      |p AS (SELECT term, doc_id, MAX(dl) AS dl, COUNT(*) AS tf
      |      FROM t GROUP BY term, doc_id)
      |SELECT term, CAST(doc_id % 4 AS INT) AS shard, doc_id, tf, dl FROM p
      |ORDER BY term, shard, doc_id""".stripMargin

  /** BM25 answered FROM the materialized index
    * ([[graft.operators.Search.indexSearch]]) — same terms, same
    * oracle as q_fulltext_rank: the gate pins the "build once, query
    * many" path to exact score equality with the scan path. */
  def qIndexSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Search.indexSearch(
      graft.operators.Search.invertedPostings(docs, "doc_id", "text"),
      graft.operators.Search.indexStats(docs, "doc_id", "text"),
      terms = Seq("hash", "merge", "scan"), k = 20)
  }

  /** implicit top-level AND of mixed predicates (query_shim.py:171-179). */
  def qDslCompound(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(Compile.fromJson(
        """{"o_orderstatus": "f",
          | "o_orderpriority": ["1-URGENT", "2-HIGH"],
          | "o_totalprice": {"type": "range", "gte": 100000, "lt": 250000}}""".stripMargin))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  val qDslCompoundSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE lower(o_orderstatus) = 'f'
      |  AND lower(o_orderpriority) IN ('1-urgent', '2-high')
      |  AND o_totalprice >= 100000 AND o_totalprice < 250000
      |ORDER BY o_orderkey""".stripMargin

  // --- geo predicates ---------------------------------------------------

  /** geo_distance with ES unit parse (query_shim.py:72-82). */
  def qDslGeoDistance(s: SparkSession, dir: String): DataFrame =
    geoView(s, dir)
      .filter(Compile.predicate(Query.parse(
        """{"geopoint": {"type": "geo_distance", "distance": "3000km",
          |  "lat": 10.0, "lon": 20.0}}""".stripMargin).predicates.head, geoOpts))
      .select(col("s_suppkey"))
      .orderBy(col("s_suppkey"))

  val qDslGeoDistanceSql: String =
    s"""WITH g AS ($geoViewSql)
       |SELECT s_suppkey FROM g
       |WHERE ${GeoFunctions.haversineSql("lat", "lon", 10.0, 20.0)} <= 3000000.0
       |ORDER BY s_suppkey""".stripMargin

  /** geo_bounding_box crossing the antimeridian (query_shim.py:68-69). */
  def qDslGeoBbox(s: SparkSession, dir: String): DataFrame =
    geoView(s, dir)
      .filter(Compile.predicate(Query.parse(
        """{"geopoint": {"type": "geo_bounding_box",
          |  "top_left": {"lat": 60.0, "lon": 150.0},
          |  "bottom_right": {"lat": -60.0, "lon": -100.0}}}""".stripMargin)
        .predicates.head, geoOpts))
      .select(col("s_suppkey"))
      .orderBy(col("s_suppkey"))

  val qDslGeoBboxSql: String =
    s"""WITH g AS ($geoViewSql)
       |SELECT s_suppkey FROM g
       |WHERE lat <= 60.0 AND lat >= -60.0
       |  AND (lon >= 150.0 OR lon <= -100.0)
       |ORDER BY s_suppkey""".stripMargin

  private val polyPoints = Seq(
    (0.0, -60.0), (70.0, 10.0), (0.0, 80.0), (-70.0, 10.0)) // (lat, lon)

  /** geo_polygon via even-odd ray casting (query_shim.py:89-90). */
  def qDslGeoPolygon(s: SparkSession, dir: String): DataFrame =
    geoView(s, dir)
      .filter(Compile.predicate(Query.parse(
        """{"geopoint": {"type": "geo_polygon", "points": [
          |  {"lat": 0.0, "lon": -60.0}, {"lat": 70.0, "lon": 10.0},
          |  {"lat": 0.0, "lon": 80.0}, {"lat": -70.0, "lon": 10.0}]}}""".stripMargin)
        .predicates.head, geoOpts))
      .select(col("s_suppkey"))
      .orderBy(col("s_suppkey"))

  val qDslGeoPolygonSql: String =
    s"""WITH g AS ($geoViewSql)
       |SELECT s_suppkey FROM g
       |WHERE ${GeoFunctions.inPolygonSql("lat", "lon", polyPoints)}
       |ORDER BY s_suppkey""".stripMargin

  /** geo_shape circle (intended semantics; the reference's own translator
    * drops geo_shape filters on a KeyError — see [[graft.dsl.ShapeGeom]]). */
  def qDslGeoShape(s: SparkSession, dir: String): DataFrame =
    geoView(s, dir)
      .filter(Compile.predicate(Query.parse(
        """{"geopoint": {"type": "geo_shape", "geometry": {
          |  "type": "circle", "coordinates": [-40.0, -20.0],
          |  "radius": "4000km"}}}""".stripMargin).predicates.head, geoOpts))
      .select(col("s_suppkey"))
      .orderBy(col("s_suppkey"))

  val qDslGeoShapeSql: String =
    s"""WITH g AS ($geoViewSql)
       |SELECT s_suppkey FROM g
       |WHERE ${GeoFunctions.haversineSql("lat", "lon", -20.0, -40.0)} <= 4000000.0
       |ORDER BY s_suppkey""".stripMargin

  // --- composed reporting query ------------------------------------------

  /** The modelable-taxa report (idb/reporting/modelable_taxonids.py:11-25)
    * — the reference's "which taxa have enough clean occurrence data to
    * model" extract: an AND-of-exists DSL filter (geopoint, taxonid,
    * canonicalname all present), a terms aggregation on taxonid with
    * min_doc_count = 20, and per bucket the TOP canonicalname sub-bucket
    * in ES terms order (count desc, key asc — replayed with min_by over
    * the (−count, key) struct, the [[Relational.qTermsNested]] device,
    * no window). The exists triple goes through [[Compile.fromJson]] —
    * the DSL compiler is load-bearing, not decorative.
    *
    * The occurrence view derives from `lineitem` with independent NULL
    * injection per field (7∤partkey keeps geopoint, 5∤suppkey keeps
    * taxonid, 11∤orderkey keeps canonicalname; every 4th named row is a
    * 'syn'-prefixed synonym so the top-name election is non-trivial).
    *
    * Scale shape: scan-with-pushed-filter → one (taxonid, name)
    * aggregate → one taxonid-sized aggregate; min_doc_count prunes
    * after the partial-combined count, exactly like the ES terms
    * collector. */
  def qTaxonModel(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.lineitem(s, dir).select(
      when(col("l_partkey") % 7 =!= 0,
        (col("l_partkey") * 7919 % 18000) / 100.0 - 90.0).as("geopoint"),
      when(col("l_suppkey") % 5 =!= 0, col("l_partkey") % 300).as("taxonid"),
      when(col("l_orderkey") % 11 =!= 0,
        concat(when(col("l_orderkey") % 4 === 0, lit("syn")).otherwise(lit("name")),
          (col("l_partkey") % 300).cast("string"))).as("canonicalname"))
    occ
      .filter(Compile.fromJson(
        """{"geopoint": {"type": "exists"},
          | "taxonid": {"type": "exists"},
          | "canonicalname": {"type": "exists"}}""".stripMargin))
      .groupBy(col("taxonid"), col("canonicalname"))
      .agg(count(lit(1)).as("sub_n"))
      .groupBy(col("taxonid"))
      .agg(sum(col("sub_n")).as("doc_count"),
        min_by(col("canonicalname"),
          struct((lit(0L) - col("sub_n")).as("_neg"), col("canonicalname")))
          .as("top_name"))
      .filter(col("doc_count") >= 20)
      .orderBy(col("doc_count").desc, col("taxonid"))
  }

  val qTaxonModelSql: String =
    """WITH occ AS (
      |  SELECT
      |    CASE WHEN l_partkey % 7 <> 0
      |      THEN (l_partkey * 7919 % 18000) / 100.0 - 90.0 END AS geopoint,
      |    CASE WHEN l_suppkey % 5 <> 0 THEN l_partkey % 300 END AS taxonid,
      |    CASE WHEN l_orderkey % 11 <> 0
      |      THEN (CASE WHEN l_orderkey % 4 = 0 THEN 'syn' ELSE 'name' END)
      |        || CAST(l_partkey % 300 AS VARCHAR) END AS canonicalname
      |  FROM lineitem),
      |sub AS (
      |  SELECT taxonid, canonicalname, COUNT(*) AS sub_n FROM occ
      |  WHERE geopoint IS NOT NULL AND taxonid IS NOT NULL
      |    AND canonicalname IS NOT NULL
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT taxonid, canonicalname,
      |    row_number() OVER (PARTITION BY taxonid
      |      ORDER BY sub_n DESC, canonicalname) AS rk,
      |    CAST(SUM(sub_n) OVER (PARTITION BY taxonid) AS BIGINT) AS doc_count
      |  FROM sub)
      |SELECT taxonid, doc_count, canonicalname AS top_name FROM r
      |WHERE rk = 1 AND doc_count >= 20
      |ORDER BY doc_count DESC, taxonid""".stripMargin
}
