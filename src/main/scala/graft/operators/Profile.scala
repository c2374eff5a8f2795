package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the "look before you shuffle" passes a
  * 100 TB pipeline runs to SIZE the real work: value histograms to
  * pick partition ranges, key-skew diagnostics to decide salting,
  * category entropy to rank mixing columns, and sketch-based join
  * cardinality estimates to choose broadcast-vs-shuffle before paying
  * for either. Reference analogue: the summary/stats passes behind
  * idb's api stats endpoints (summary counts, top values) — here
  * generalized into reusable profiling primitives.
  *
  * All four are one-or-two-aggregation plans over the scan (map-side
  * combined, groups-sized results) — nothing joins data to data, and
  * every emitted number is either exact integer arithmetic or one
  * deterministic IEEE double step, so the profiles replay bit-for-bit
  * under the DuckDB oracle.
  */
object Profile {

  /** Per-group equi-width histogram over an INTEGER measure in exact
    * integer arithmetic: bucket of x = floor((x − lo)·B / (hi − lo + 1))
    * over the group's own [lo, hi] — the +1 makes the divisor cover hi
    * (bucket index stays < B) with no floating widths and no
    * edge-epsilon: every step is a BIGINT multiply/divide both engines
    * evaluate identically. Output one row per NON-EMPTY (group,
    * bucket): group, bucket, lo, hi, n.
    *
    * Plan: one groups-sized min/max aggregation joined back to the
    * scan (broadcast-sized), then one (group, bucket) count — two
    * exchanges, both on aggregation keys, nothing row-expanding.
    * Empty buckets are omitted by design (the consumer densifies
    * against `range(B)` if it wants zeros — keeping the operator's
    * output proportional to occupied buckets, not G·B). */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"need >= 1 bucket, got $buckets")
    val stats = df.groupBy(col(groupCol)).agg(
      min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
    df.join(stats, groupCol)
      .withColumn("bucket",
        floor((col(valueCol) - col("lo")) * lit(buckets.toLong) /
          (col("hi") - col("lo") + lit(1L))).cast("long"))
      .groupBy(col(groupCol), col("bucket"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bucket"), col("lo"), col("hi"), col("n"))
  }

  /** Key-skew diagnostic for a prospective shuffle/join key: ONE row —
    *   n_rows, n_keys (exact), max_cnt (the heaviest key's count),
    *   hot_key (deterministic: the lexicographically-last among
    *   tied-heaviest, via max over struct(cnt, key)),
    *   skew6 = round(max_cnt · n_keys / n_rows, 6) — 1.0 means
    * perfectly uniform, ≥ ~8 means the hot key dominates its
    * hash-partition and the join wants salting ([[Skew.saltedJoin]])
    * or an AQE skew split. The decision input, computed for the cost
    * of one per-key count (map-side combined) plus a keys-sized
    * single-row fold — run it BEFORE the 100 TB shuffle, not after
    * the straggler shows up. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("_c"))
      .agg(sum(col("_c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("_c")).as("max_cnt"),
        max(struct(col("_c"), col(keyCol).cast("string").as("k"))).as("_m"))
      .select(col("n_rows").cast("long").as("n_rows"), col("n_keys"),
        col("max_cnt"), col("_m").getField("k").as("hot_key"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double"), 6).as("skew6"))

  /** Per-group Shannon entropy (nats, 6 decimals) of a categorical
    * column — the "how mixed is this domain" score that ranks
    * stratification columns and flags near-constant ones before a
    * pipeline keys anything on them. Determinism: each category's
    * term p·ln(1/p) is rounded to integer NANO-nats (one IEEE
    * multiply+log per CATEGORY, then round — both engines see the
    * same double), summed as exact BIGINTs (order-independent — the
    * float-summation-order hazard is rounded away BEFORE the sum, the
    * repo's round-before-rank convention applied to addition), and
    * divided by 1e9 at the end.
    *
    * Plan: (group, category) count → groups-sized totals join →
    * groups-sized term sum. Two aggregations, both map-side combined;
    * the categorical domain never leaves its aggregation. */
  def entropy(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("_c"))
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("_n"), count(lit(1)).as("n_cats"))
    val p = col("_c").cast("double") / col("_n").cast("double")
    counts.join(totals, groupCol)
      .withColumn("_t",
        round(-p * log(p) * lit(1e9)).cast("long"))
      .groupBy(col(groupCol), col("n_cats"))
      .agg(sum(col("_t")).as("_nano"))
      .select(col(groupCol), col("n_cats"),
        round(col("_nano").cast("double") / lit(1e9), 6).as("entropy6"))
  }

  /** Canonical cross-engine string rendering of a profiled extremum —
    * the helper that lets double/timestamp columns under the oracle
    * gate (integers and strings render identically everywhere, but
    * Spark prints small doubles in scientific notation where DuckDB
    * prints positional — "1.0E-4" vs "0.0001" — and timestamp
    * fractional-second trailing-zero conventions differ):
    *   - float/double → DECIMAL(38,6) → string: fixed positional form
    *     with exactly 6 fractional digits ("0.000100"), the DuckDB
    *     replay being CAST(CAST(x AS DECIMAL(38,6)) AS VARCHAR). The
    *     1e-6 grid follows the repo-wide micro-unit convention; a
    *     value within half an ULP of a grid midpoint may round
    *     differently across engines (shortest-repr vs full binary
    *     expansion), the same documented wobble class as every other
    *     micro-quantized gate. |x| ≥ 10^32 overflows the decimal and
    *     renders NULL — profiling extrema at that magnitude are
    *     sentinel junk anyway, and both engines null identically.
    *   - timestamp → date_format 'yyyy-MM-dd HH:mm:ss.SSSSSS': fixed
    *     6-digit microseconds, DuckDB's strftime '%f' replaying it.
    *   - everything else → plain string cast (unchanged behavior). */
  def canonicalRender(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case DoubleType | FloatType =>
        c.cast(DecimalType(38, 6)).cast("string")
      case TimestampType | TimestampNTZType =>
        date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
      case _ => c.cast("string")
    }
  }

  /** Per-column data-quality profile: for each requested column, one
    * output row with
    *   n_nulls, n_distinct (exact; counts non-null values),
    *   min_val / max_val (native-type extrema, cast to string AFTER
    *   the comparison — lexicographic min of "10" < "9" never leaks
    *   into numeric columns; double/timestamp extrema go through
    *   [[canonicalRender]] so both engines print the same string).
    * The first look a pipeline takes at an unknown 100 TB table —
    * which columns are junk, which are keys, which are constants.
    *
    * Shape: one SINGLE-COLUMN pass per profiled column, unioned. The
    * previous all-in-one formulation (every metric in one `df.agg`)
    * paid Spark's multi-distinct rewrite — an Expand multiplying every
    * scan row ×(C+1) before the aggregate, the board's most expensive
    * non-staged plan. Per-column passes each read ONE column off the
    * columnar scan (pruned — total bytes equal the single wide scan)
    * and plan as the no-Expand single-distinct two-phase aggregate;
    * the C result rows union driver-free. Adjudicated round 17:
    * 2.42 s → 0.80 s warm on the sf0.1 gate (BENCH_NOTES.md).
    *
    * CONSTRAINT: the per-column trade assumes a column-prunable source
    * (parquet/ORC/cached) — the lake's storage contract here. Against
    * a row-based, non-prunable input (CSV/JSON/RDD-backed), the C
    * branches each re-read the whole file; profile such inputs through
    * a `.cache()` or a columnar staging copy first. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      val dt = df.schema(c).dataType
      df.select(col(c))
        .agg(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          canonicalRender(min(col(c)), dt).as("min_val"),
          canonicalRender(max(col(c)), dt).as("max_val"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency profile: for each candidate determinant →
    * dependent pair, does det functionally determine dep in this
    * data? Emits one row per pair — distinct determinant count,
    * violating determinants (those mapping to >1 dependent value),
    * and the holds flag. The schema-inference pass that finds real
    * keys and denormalized copies before a pipeline trusts either.
    * Each pair is one (det, dep) distinct + one groups-sized count —
    * map-side combined, nothing wider than the key domain. */
  def fdProfile(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    pairs.map { case (det, dep) =>
      // null dependents don't witness a violation (SQL's
      // count(DISTINCT) convention — a det mapping to {x, null} still
      // holds); null determinants are likewise out of scope
      df.where(col(det).isNotNull && col(dep).isNotNull)
        .select(col(det).as("_d"), col(dep).as("_v")).distinct()
        .groupBy(col("_d")).agg(count(lit(1)).as("_nv"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("_nv") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(det).as("det"), lit(dep).as("dep"),
          col("n_keys"), col("n_violating").cast("long").as("n_violating"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Inclusion-dependency check: is every distinct value of a.aCol
    * present in b.bCol? One row — |distinct a|, how many are missing
    * from b, and the containment flag (the foreign-key discovery /
    * referential-integrity audit). An anti-join of the two DISTINCT
    * key sets: key-domain-sized, never data×data. */
  def inclusionCheck(a: DataFrame, aCol: String, b: DataFrame,
      bCol: String): DataFrame = {
    // null keys are excluded on BOTH sides: SQL's NOT IN collapses to
    // UNKNOWN the moment either side holds a null, so the only
    // null-robust containment question is over non-null keys — pin
    // that semantic here rather than inherit the join's null rules
    val da = a.select(col(aCol).as("_k")).where(col("_k").isNotNull)
      .distinct()
    val missing = da.join(
      b.select(col(bCol).as("_k")).where(col("_k").isNotNull).distinct(),
      Seq("_k"), "left_anti")
    da.agg(count(lit(1)).as("n_distinct"))
      .crossJoin(broadcast(missing.agg(count(lit(1)).as("n_missing"))))
      .select(col("n_distinct"), col("n_missing"),
        (col("n_missing") === 0).as("contained"))
  }

  /** Sampled aggregate with its exact twin: per group, the mean of an
    * integer measure estimated from a deterministic `pct`% content-
    * hash sample, next to the exact mean — the "is a 10% scan good
    * enough" calibration a 100 TB pipeline runs before switching its
    * dashboards to samples. The sample membership is a pure function
    * of the id (hash60 mod 100 < pct): replayable, and the SAME rows
    * sample on every run and every engine. Integer sums, one
    * division each, round 6. */
  def sampledMean(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 99)
    val inSample = pmod(TextDedup.hash60(col(idCol).cast("string")),
      lit(100L)) < pct
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("_s"),
        sum(when(inSample, 1L).otherwise(0L)).as("n_sample"),
        sum(when(inSample, col(valueCol)).otherwise(lit(0L))).as("_ss"))
      .where(col("n_sample") > 0)
      .select(col(groupCol), col("n"), col("n_sample"),
        round(col("_s").cast("double") / col("n").cast("double"), 6)
          .as("mean6_exact"),
        round(col("_ss").cast("double") / col("n_sample").cast("double"), 6)
          .as("mean6_est"))
  }

  /** Chi-square independence statistic for a two-column contingency
    * table: χ² = Σ_cells (o·N − r·c)² / (N·r·c) — "are these two
    * categorical columns independent", the screen a feature pipeline
    * runs before trusting a column pair (or deliberately dropping a
    * redundant one). Determinism: the difference d = o·N − r·c is
    * exact BIGINT; d², the division, and the per-cell term are IEEE
    * doubles both engines compute identically from identical integer
    * inputs, and each cell's term rounds to nano BEFORE the
    * order-independent sum (the [[entropy]] convention). Also emits
    * degrees of freedom (r−1)(c−1). Plan: one (x, y) cell count, two
    * marginal aggregations OFF the cell table, broadcast scalars —
    * the categorical domains never leave their aggregations. */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val observed = df.groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("_o"))
    // χ² sums over the FULL nx×ny grid — an unobserved cell still
    // contributes its expectation term r·c/N (a groupBy alone would
    // silently understate dependence); the grid cross join is
    // categorical-domain-sized, a dimension table
    val cells = observed.select(col("_x")).distinct()
      .crossJoin(observed.select(col("_y")).distinct())
      .join(observed, Seq("_x", "_y"), "left")
      .withColumn("_o", coalesce(col("_o"), lit(0L)))
    val rows = cells.groupBy(col("_x")).agg(sum(col("_o")).as("_r"))
    val cols_ = cells.groupBy(col("_y")).agg(sum(col("_o")).as("_c"))
    val n = cells.agg(sum(col("_o")).as("_n"),
      countDistinct(col("_x")).as("_nx"), countDistinct(col("_y")).as("_ny"))
    val d = (col("_o") * col("_n") - col("_r") * col("_c")).cast("double")
    cells.join(rows, "_x").join(cols_, "_y")
      .crossJoin(broadcast(n)) // 1-row scalar
      .withColumn("_t", round(d * d /
        (col("_n").cast("double") * col("_r").cast("double")
          * col("_c").cast("double")) * lit(1e9)).cast("long"))
      .groupBy(col("_nx"), col("_ny"))
      .agg(sum(col("_t")).as("_nano"), count(lit(1)).as("n_cells"))
      .select(col("n_cells"),
        ((col("_nx") - 1) * (col("_ny") - 1)).as("dof"),
        round(col("_nano").cast("double") / lit(1e9), 6).as("chi26"))
  }

  /** Per-group OLS trend slope of an integer measure against event
    * time — "is this user's/domain's activity rising or falling",
    * the regression a monitoring pipeline fits per key without ever
    * collecting a group:
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
    * x = seconds since the stream's min timestamp (broadcast scalar —
    * keeping x small enough that every sum term stays exact BIGINT;
    * bound documented below), y the measure. The numerator and
    * denominator are EXACT integers; the only floating steps are one
    * division and one unit scale (×86400 → per-day), rounded to 6.
    * Groups need ≥ 2 distinct x (den > 0). One aggregation.
    *
    * Exactness bound: n·Σx² < 2^63 needs n·(span_s)²·n ≲ 9e18 — a
    * month-long span (2.6e6 s) allows ~1.3e6 rows per group at
    * BIGINT; beyond that re-base x per group or widen to
    * DECIMAL(38,0) in the same shape. */
  def trendSlope(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val t0 = df.agg(min(unix_micros(col(tsCol))).as("_t0"))
    val based = df.crossJoin(broadcast(t0)) // 1-row scalar
      .withColumn("_x",
        floor((unix_micros(col(tsCol)) - col("_t0")) / lit(1000000L))
          .cast("long"))
      .withColumn("_y", col(valueCol))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val den = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    based.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
      .where(den > 0)
      .select(col(groupCol), col("_n").as("n"),
        round(num.cast("double") / den.cast("double") * lit(86400.0), 6)
          .as("slope6_per_day"))
  }

  /** Per-group quantile binning: assign every row its B-quantile
    * bucket under the (value, id) total order — ntile, the feature
    * discretization a training pipeline applies before bucketized
    * embeddings / monotonic-binning models. One window per group key
    * (never global); ties broken by id make the assignment
    * deterministic and oracle-replayable (SQL ntile is
    * order-sensitive, so the total order IS the contract). */
  def quantileBins(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    df.withColumn("bin", ntile(buckets).over(w))
  }

  /** EXACT global ntile WITHOUT an unpartitioned window — the
    * scale-correct form of `ntile(n) OVER (ORDER BY v, id)`: range-
    * bucket rows by a MONOTONE function of the sort value (caller-
    * supplied — the identity for small-domain ints, a high-bits shift
    * for wide ones), rank within buckets, add broadcast cumulative
    * bucket bases (the [[graft.operators.Corpus.shuffleOrder]]
    * two-level discipline), then map the exact global rank through
    * SQL ntile's floor arithmetic: with N rows, q = N/n, r = N%n,
    * tiles 1..r get q+1 rows. Bit-identical to the window form
    * (ProfileSpec pins it) at any partitioning, with no single-task
    * sort anywhere.
    *
    * Null contract: `valueCol` must be non-null (Spark's default
    * window order is NULLS FIRST where DuckDB's is NULLS LAST, so a
    * null-tolerant form would silently diverge from a SQL oracle —
    * filter or coalesce nulls before calling). */
  def globalNtile(df: DataFrame, valueCol: String, idCol: String,
      n: Int, bucketOf: Column => Column, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.withColumn("_b", bucketOf(col(valueCol)))
    val wLocal = Window.partitionBy(col("_b"))
      .orderBy(col(valueCol), col(idCol))
    val wBase = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = keyed.groupBy(col("_b")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_base", sum(col("_cnt")).over(wBase) - col("_cnt"))
      .select(col("_b"), col("_base"))
    val total = keyed.agg(count(lit(1)).as("_N"))
    // SQL ntile: with N rows, q = N div n, r = N mod n; rank rk
    // (1-based) lands in tile
    //   rk <= r*(q+1)  ->  1 + (rk-1) div (q+1)
    //   else          ->  r + 1 + (rk - r*(q+1) - 1) div q
    // (N < n never divides by q=0: the first branch covers rk <= N)
    keyed
      .withColumn("_lr", row_number().over(wLocal))
      .join(broadcast(bases), Seq("_b"))
      .crossJoin(broadcast(total)) // 1-row scalar
      .withColumn("_rk", col("_base") + col("_lr"))
      .withColumn("_q", floor(col("_N") / lit(n.toLong)).cast("long"))
      .withColumn("_r", (col("_N") % lit(n.toLong)).cast("long"))
      .withColumn(outCol,
        when(col("_rk") <= col("_r") * (col("_q") + 1),
          lit(1L) + floor((col("_rk") - 1) / (col("_q") + 1)).cast("long"))
        .otherwise(col("_r") + 1 +
          floor((col("_rk") - col("_r") * (col("_q") + 1) - 1) /
            col("_q")).cast("long"))
        .cast("int"))
      .drop("_b", "_lr", "_base", "_N", "_rk", "_q", "_r")
  }

  /** Categorical distribution drift between two snapshots as EXACT
    * total-variation distance: TV = ½·Σ_cat |p_a − p_b| computed by
    * integer cross-multiplication —
    *   |c_a·n_b − c_b·n_a|  summed as BIGINTs, ONE division at the
    * end: tv6 = round(Σ / (2·n_a·n_b), 6). No per-category floating
    * ratios, no summation-order hazard — the drift monitor a nightly
    * pipeline runs between yesterday's and today's partition before
    * trusting a model trained on either. Also emits the top drifted
    * category (max |cross| — deterministic, ties to the larger
    * category string). Plan: two per-category counts (map-side
    * combined), a categories-sized full outer join, a 1-row fold. */
  def categoryDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.groupBy(col(catCol)).agg(count(lit(1)).as("_ca"))
    val cb = b.groupBy(col(catCol)).agg(count(lit(1)).as("_cb"))
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    ca.join(cb, Seq(catCol), "full_outer")
      .select(col(catCol).cast("string").as("_cat"),
        coalesce(col("_ca"), lit(0L)).as("_x"),
        coalesce(col("_cb"), lit(0L)).as("_y"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb)) // 1-row scalars
      .withColumn("_cross",
        abs(col("_x") * col("n_b") - col("_y") * col("n_a")))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("_cross")).as("_num"),
        max(struct(col("_cross"), col("_cat"))).as("_top"),
        count(lit(1)).as("n_cats"))
      .select(col("n_a"), col("n_b"), col("n_cats"),
        col("_top").getField("_cat").as("top_cat"),
        round(col("_num").cast("double") /
          (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")),
          6).as("tv6"))
  }

  /** Robust per-group outliers by median absolute deviation — the
    * MAD rule |x − med| > c·MAD that survives the contaminated tails
    * a mean/σ z-score is dragged by. EXACT end to end on integer
    * measures: both medians are type-1 order statistics (the value at
    * 0-based index floor((n−1)/2) under the (value, id) total order —
    * an index pick, not an interpolation), deviations and the flag
    * are BIGINT arithmetic, so the flagged set replays with no
    * floating step at all. MAD = 0 (a majority-constant group) flags
    * every deviating row — the conventional degenerate reading.
    *
    * Plan: two window/rank passes (each one exchange on the group
    * key: row_number under a total order + the group count joined
    * back), never a per-group collect — group sizes are unbounded at
    * 100 TB and this shape doesn't care. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, c: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def median(in: DataFrame, vCol: String, outCol: String): DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col(vCol), col(idCol))
      val sizes = in.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
      in.withColumn("_rk", row_number().over(w))
        .join(sizes, groupCol)
        .where(col("_rk") === (floor((col("_n") - 1) / 2) + 1))
        .select(col(groupCol), col(vCol).as(outCol))
    }
    val med = median(df.select(col(groupCol), col(valueCol), col(idCol)),
      valueCol, "med")
    val withDev = df.join(med, groupCol)
      .withColumn("_dev", abs(col(valueCol) - col("med")))
    val mad = median(withDev.select(col(groupCol), col("_dev"), col(idCol)),
      "_dev", "mad")
    withDev.join(mad, groupCol)
      .where(col("_dev") > lit(c.toLong) * col("mad"))
      .select(col(idCol), col(groupCol), col(valueCol), col("med"),
        col("mad"))
  }

  /** Sketch-based equi-join cardinality ESTIMATE vs the true count —
    * the broadcast-vs-shuffle decision input, priced at two key scans
    * instead of the join: KMV-sketch both sides' key domains
    * ([[Sketches.kmvOverlap]] over the tagged union), estimate the
    * matching-key count from the sketch intersection, and scale by
    * each side's exact average multiplicity (rows/distinct — two
    * cheap aggregates):
    *   est_rows = floor(est_keys · (n_a/d_a) · (n_b/d_b)).
    * Exact when both key domains fit inside k (the sketches ARE the
    * domains); within KMV error bands above it. The multiplicative
    * model assumes per-key multiplicities uncorrelated with matching
    * — the standard System-R-style independence assumption, and the
    * operator ships the TRUE count next to the estimate so its error
    * is always visible (drop `true_rows` in production to skip the
    * actual join). */
  def joinCardinality(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, k: Int): DataFrame = {
    val tagged = a.select(lit("a").as("side"),
        TextDedup.hash60(col(aKey).cast("string")).as("h"))
      .unionByName(b.select(lit("b").as("side"),
        TextDedup.hash60(col(bKey).cast("string")).as("h")))
    val overlap = Sketches.kmvOverlap(tagged, "side", "h", k)
      .select(col("est_inter").as("est_keys"))
    val statsA = a.agg(count(lit(1)).as("n_a"),
      countDistinct(col(aKey)).as("d_a"))
    val statsB = b.agg(count(lit(1)).as("n_b"),
      countDistinct(col(bKey)).as("d_b"))
    val truth = a.select(col(aKey).as("_k"))
      .join(b.select(col(bKey).as("_k")), "_k")
      .agg(count(lit(1)).as("true_rows"))
    overlap.crossJoin(broadcast(statsA)) // all four are 1-row scalars
      .crossJoin(broadcast(statsB))
      .crossJoin(broadcast(truth))
      .select(col("est_keys"), col("n_a"), col("d_a"), col("n_b"),
        col("d_b"),
        floor(col("est_keys").cast("double")
          * (col("n_a").cast("double") / col("d_a").cast("double"))
          * (col("n_b").cast("double") / col("d_b").cast("double")))
          .cast("long").as("est_rows"),
        col("true_rows"))
  }
}
