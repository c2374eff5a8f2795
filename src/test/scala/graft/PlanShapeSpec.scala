package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape pins for the operators added in round 5 — the
  * properties that make them survive a 100× scale-up, asserted so a
  * future refactor can't silently regress them:
  *  - dimension enrich pipelines stay shuffle-free and UDF-free;
  *  - the corrections engine joins only by broadcast (records never
  *    shuffle);
  *  - the datum shift stays inside the single enrich projection chain;
  *  - the suspects gate is a pure projection.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("recordsets/publishers enrich: no shuffle, no UDF") {
    val rs = graft.etl.Enrich.recordsets(
      Seq(1L).toDF("id").select(col("id"),
        map(lit("collection_name"), lit("x")).as("data")))
    val pub = graft.etl.Enrich.publishers(
      Seq(1L).toDF("id").select(col("id"),
        map(lit("name"), lit("x")).as("data")))
    for (p <- Seq(plan(rs), plan(pub))) {
      assert(!p.contains("Exchange"), "dimension enrich must not shuffle")
      assert(!p.toLowerCase.contains("scalaudf"), "must not use UDFs")
    }
  }

  test("datum reprojection stays inside the enrich projection (no shuffle)") {
    val df = Seq(1L).toDF("id").select(col("id"), map(
      lit("dwc:decimalLatitude"), lit("39.8"),
      lit("dwc:decimalLongitude"), lit("-98.5"),
      lit("dwc:geodeticDatum"), lit("NAD27")).as("data"))
    val p = plan(graft.etl.Enrich.records(df))
    assert(!p.contains("Exchange"), "datum shift must not add a shuffle")
    assert(!p.toLowerCase.contains("scalaudf"))
  }

  test("locality corrections: broadcast joins only, records never shuffle") {
    val recs = Seq((1L, "Florida", null: String)).toDF("id", "stateprovince", "country")
      .select(col("id"), col("stateprovince"), col("country"),
        lit(null).cast("string").as("continent"),
        lit(null).cast("string").as("countrycode"),
        lit(null).cast("string").as("kingdom"))
    val fieldCol = Map(
      "dwc:stateProvince" -> "stateprovince", "dwc:country" -> "country",
      "dwc:continent" -> "continent",
      "idigbio:isoCountryCode" -> "countrycode", "dwc:kingdom" -> "kingdom")
    val p = plan(graft.etl.Corrections.apply(
      recs, graft.etl.Locality.rules, fieldCol))
    assert(p.contains("BroadcastHashJoin"), "rule stages must broadcast")
    assert(!p.contains("SortMergeJoin"), "record side must never shuffle-join")
    assert(!p.contains("Exchange hashpartitioning"),
      "record side must never be hash-repartitioned")
  }

  test("corrections gates enforce id order with one Sort over a cut child") {
    // the r21 sort-at-source form was silently removed by Catalyst
    // (EliminateSorts drops sorts below joins), leaving the id-ordered
    // output contract riding on incidental file order. The r22 form
    // (cut-then-sort) must keep EXACTLY ONE enforced Sort whose child
    // is the materialized cut (ExistingRDD) — and no re-execution of
    // the correction pipeline (no join) inside the sorted plan.
    val dir = "/root/testdata/sf0.001"
    for (gate <- Seq(
        graft.queries.CorrectionQueries.qCorrections(spark, dir),
        graft.queries.CorrectionQueries.qCorrectionsGeo(spark, dir))) {
      val p = plan(gate)
      assert("(?m)^(?!.*InMemory).*Sort".r.findAllIn(p).size == 1,
        s"exactly one enforced Sort expected:\n$p")
      assert(p.contains("ExistingRDD"),
        s"the Sort must read the materialized cut:\n$p")
      assert(!p.contains("Join"),
        s"the correction pipeline must not re-run inside the sorted plan:\n$p")
    }
    graft.Staging.releasePinned(spark)
  }

  test("suspects gate is a pure projection (no shuffle, no join)") {
    val ctr = Seq((1L, true, 100L, 10L, 90L, 0L, 50L, 10L, 40L, 0L))
      .toDF("id", "ok", "rc", "rcr", "rup", "rdel", "mc", "mcr", "mup", "mdel")
    val p = plan(ctr.select(col("id"),
      graft.ingest.SummaryChecks.suspectTag(col("ok"), col("rc"), col("rcr"),
        col("rup"), col("rdel"), col("mc"), col("mcr"), col("mup"),
        col("mdel")).as("tag")))
    assert(!p.contains("Exchange") && !p.contains("Join"))
  }

  // --- round-6 pins: native kernels keep per-row families shuffle-free --

  test("native kernel summaries are pure per-row scans (no shuffle/join/agg)") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val perRow = Seq(
      docs.select(graft.functions.NativeText.minhashSig(
        split(col("text"), " "), 3)),
      docs.select(graft.functions.NativeText.simhash60(
        split(col("text"), " "))),
      docs.select(graft.functions.NativeText.repetitionStats(
        split(col("text"), " "))),
      docs.select(graft.functions.NativeTextStats.textStats(
        split(col("text"), " "), Seq("the"))),
      docs.select(graft.functions.NativeTextStats.langId(
        split(col("text"), " "),
        graft.operators.TextStats.stopwordProfiles.toSeq)))
    perRow.foreach { df =>
      val p = plan(df)
      assert(!p.contains("Exchange") && !p.contains("Aggregate"),
        s"per-row kernel must not shuffle or aggregate:\n$p")
      assert(!p.toLowerCase.contains("scalaudf"))
    }
  }

  test("ANN ranking runs on the heap operator, not a window sort") {
    val e = (1L to 40L).map(i => (i, Array.tabulate(8)(d => (i * d % 7 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val df = graft.operators.Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 3), k = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), s"rank must not fall back to a window:\n$p")
  }

  test("bm25 attaches corpus stats by broadcast and top-ks without a full sort") {
    // more rows than k — otherwise EliminateLimits drops the Limit
    // (maxRows <= k) and no TakeOrderedAndProject can form
    val docs = (1L to 20L).map(i => (i, s"a b w$i")).toDF("doc_id", "text")
    val p = plan(graft.operators.Search.bm25TopK(docs, "doc_id", "text", Seq("b"), 5))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"stats must broadcast, never shuffle-join:\n$p")
  }

  test("heavy hitters: candidates broadcast into the recount, final " +
      "top-k is TakeOrderedAndProject, no cartesian anywhere") {
    val words = (1 to 200).map(i => s"w${i % 12}").toDF("word")
    val df = graft.operators.Sketches.heavyHitters(words, "word", 3, 64)
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), s"candidates must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the MG pass runs as an object-buffer aggregate (partial per task)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("pq ANN: corpus side is a scan + broadcast probes — no corpus " +
      "exchange before scoring") {
    val vecs = (1L to 40L)
      .map(i => (i, Array.tabulate(8)(d => (i * d % 7 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val df = graft.operators.Similarity.pqTopK(
      vecs, vecs.filter(col("vec_id") < 3), 2, codebookMod = 7,
      m = 2, numCodes = 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("SortMergeJoin"),
      s"probes must broadcast, the corpus must never shuffle-join:\n$p")
  }

  test("ivf assignment aggregates without a window sort") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0, 0.0))).toDF("cid", "c")
    val p = plan(graft.operators.Similarity.ivfAssign(vecs, cents))
    assert(!p.contains("Window"),
      "argmin must be the partial-aggregable min_by, not a window sort")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin")
      || p.contains("Broadcast"), "centroid side must broadcast")
  }

  test("two-level ivf: both quantizer layers broadcast and min_by-combine " +
      "(no window sort over the corpus), search side never shuffle-joins") {
    val vecs = (0L until 12L).map(i => (i, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = (0L until 9L).map(i => (i, Array(i.toFloat, 1.0f)))
      .toDF("cid", "c")
    val assigned = graft.operators.Similarity.ivfAssignHierarchical(vecs, cents)
    val pa = plan(assigned)
    // the corpus-side argmins must be min_by aggregates, asserted
    // DIRECTLY (the r20 ADVICE finding: the old negated-contains arm
    // was true under any plan-string drift, so a regression back to a
    // window argmin could slip through)
    assert(pa.contains("min_by"),
      s"corpus argmin must be the partial-aggregable min_by:\n$pa")
    // and the ONLY window in the plan is the centroid-table rank
    // (broadcast-sized by contract) — never a corpus-keyed spec
    assert(!pa.contains("windowspecdefinition(vid"),
      s"no corpus-keyed window allowed in the quantizer plan:\n$pa")
    assert(pa.contains("Broadcast"), "super/centroid sides must broadcast")
    assert(!pa.contains("SortMergeJoin"),
      s"the corpus must never shuffle-join against centroid tables:\n$pa")
    val ps = plan(graft.operators.Similarity.ivf2TopK(
      assigned, col("vid") < 2, k = 3))
    assert(ps.contains("Broadcast"), "probe side must broadcast")
    assert(!ps.contains("CartesianProduct"), "no cartesian anywhere")
  }

  test("index-backed bm25: top-k plans as TakeOrderedAndProject, stats " +
      "broadcast, no sort-merge join") {
    val docs = Seq((1L, "hash join probe"), (2L, "merge scan"),
      (3L, "scan scan")).toDF("doc_id", "text")
    val df = graft.operators.Search.indexSearch(
      graft.operators.Search.invertedPostings(docs, "doc_id", "text"),
      graft.operators.Search.indexStats(docs, "doc_id", "text"),
      Seq("hash", "scan"), k = 5)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must be heap+merge, not a full sort:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"stats/dfs are 1-row broadcasts; nothing may shuffle-join:\n$p")
  }

  test("quantile sketch: the bounded heap operator, not a window sort") {
    val docs = (1L to 100L).map(i => ("g", i, i * 3)).toDF("g", "id", "v")
    val p = plan(graft.operators.Sketches.quantileSketch(
      docs, "g", "v", "id", 16, Seq("p50" -> 0.5)))
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), "sampling must not be a row_number window")
  }

  test("nested terms agg: stacked aggregations, no window, no join") {
    val ev = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("event_type", "props")
    val df = ev.groupBy(col("event_type"), col("props"))
      .agg(count(lit(1)).as("sub_n"))
      .groupBy(col("event_type"))
      .agg(sum(col("sub_n")).as("n"),
        min_by(col("props"),
          struct((lit(0L) - col("sub_n")).as("_neg"), col("props")))
          .as("top_props"))
    val p = plan(df)
    assert(!p.contains("Window"), "top sub-bucket must be min_by, not row_number")
    assert(!p.contains("Join"), "the outer rollup reads sub-bucket rows directly")
  }

  test("z-value is a pure projection: no shuffle, no UDF") {
    val pts = Seq((10.0, 20.0)).toDF("lat", "lon")
    val p = plan(pts.select(
      graft.store.Layout.zValue(col("lat"), col("lon"), 16)))
    assert(!p.contains("Exchange"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }

  test("fuzzy join: candidates come from the rare-gram equi-join — " +
      "never a cross join") {
    val names = (0L until 50L).map(i => (i, f"Name#$i%04d"))
      .toDF("id", "name")
    val p = plan(graft.operators.Fuzzy.editDistanceJoin(
      names, "id", "name", maxDist = 1))
    assert(!p.contains("CartesianProduct"),
      s"gram path must equi-join; only the bounded short-band may nest:\n$p")
    assert(p.contains("levenshtein"), "verify stage must be present")
  }

  test("keep-best dedup: argmax aggregates the members relation, " +
      "no corpus-wide window") {
    val corpus = (1L to 200L).map(i => (i, i * 3)).toDF("doc_id", "score")
    val labels = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val p = plan(graft.operators.Graph.keepBest(
      corpus, "doc_id", labels, "score"))
    assert(!p.contains("Window"), "argmax must be max_by, not row_number")
    assert(p.contains("LeftAnti"), "corpus is touched only by the anti-join")
  }

  test("pmi collocations: global top-k plans as TakeOrderedAndProject, " +
      "corpus scalar broadcast") {
    val docs = (1 to 30).map(i => (i.toLong, s"w${i % 5} w${i % 7} body"))
      .toDF("doc_id", "text")
    val p = plan(graft.operators.Search.pmiCollocations(docs, "text", 2, 10))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be the bounded form:\n$p")
    assert(p.contains("BroadcastExchange"), "the 1-row N must broadcast")
  }

  test("decay score: one aggregation over the scan, horizon broadcast, " +
      "no window") {
    val ev = (1 to 40).map(i => (i.toLong % 5,
      new java.sql.Timestamp(1700000000000L + i * 1000L), i.toDouble))
      .toDF("user_id", "ts", "value")
    val p = plan(graft.operators.Events.decayScore(ev, "user_id", "ts",
      "value", 3600.0))
    assert(!p.contains("Window"), "decay must not use a window")
    assert(p.contains("BroadcastExchange"), "horizon must broadcast")
    assert(!p.toLowerCase.contains("scalaudf"), "no UDFs")
  }

  test("ohlc bars: single aggregation, no window, no sort below the agg") {
    val ev = (1 to 40).map(i => (i.toLong % 3,
      new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong,
      (i * 7 % 100).toLong)).toDF("k", "ts", "id", "v")
    val p = plan(graft.operators.Events.ohlcBars(ev, "k", "ts", "id", "v"))
    assert(!p.contains("Window"), "open/close must be min_by/max_by")
    // min_by over a struct ordering plans as SortAggregate (struct agg
    // buffers aren't hash-aggregable) — still ONE partial-aggregated
    // pass with exactly one exchange on the group key
    assert(p.contains("Aggregate"), "one aggregation")
    assert("Exchange".r.findAllIn(p).size == 1, "exactly one exchange")
  }

  test("centroid classify: labels-sized broadcast over the corpus scan, " +
      "no corpus self-join, no window") {
    val emb = (1 to 60).map(i => (i.toLong, s"c${i % 3}",
      Seq.fill(4)(i.toFloat / 60))).toDF("vec_id", "label", "embedding")
    val p = plan(graft.operators.Similarity.nearestCentroidConfusion(
      emb, "vec_id", "label", "embedding"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), "centroids must broadcast")
    assert(!p.contains("Window"), "argmin must be struct min, not a window")
    assert(!p.contains("SortMergeJoin"), "the corpus must never self-join")
  }

  test("download dedup decisions: the latest-prior-task pick is the " +
      "as-of union-and-window — ONE hash-partitioned window, ZERO " +
      "joins (the equi-join + max_by form was requests × tasks-per-" +
      "hash and died quadratically at the 100x stress)") {
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 00:00:00")
    val tasks = Seq(("A", "t1", ts("2024-03-01"), "SUCCESS"))
      .toDF("query_hash", "tid", "created", "task_status")
    val reqs = Seq(("r1", "A", ts("2024-03-02"), false))
      .toDF("req_id", "query_hash", "req_time", "force")
    val p = plan(graft.export.Download.dedupDecisions(reqs, tasks))
    assert(!p.contains("Join"),
      s"no join of any kind — the pick must ride the window:\n$p")
    val winLines = p.linesIterator.filter(_.contains("Window")).toList
    assert(winLines.nonEmpty && winLines.forall(_.contains("query_hash")),
      s"the carry window must partition on query_hash:\n${winLines.mkString}")
  }

  test("sorted-neighborhood pairs: rank windows are bucket-partitioned; " +
      "neighbor pairing is an integer equi-join") {
    val docs = (1 to 50).map(i => (i.toLong, s"t${i % 9} body text $i"))
      .toDF("doc_id", "text")
    val p = plan(graft.operators.TextDedup.sortedNeighborPairs(
      docs, "doc_id", "text", 3, 0.5))
    // the data-sized row_number window must carry the _b partition key
    val winLines = p.linesIterator.filter(l =>
      l.contains("Window") && l.contains("row_number")).toList
    assert(winLines.nonEmpty && winLines.forall(_.contains("_b")),
      s"rank must be bucket-partitioned:\n${winLines.mkString}")
    assert(!p.contains("CartesianProduct"),
      "pairing must be the rank equi-join, never a cross product")
  }

  test("randomProject: one codegen'd scan — no shuffle, no UDF; " +
      "projectedRerankTopK: probes broadcast, corpus never cartesians") {
    val vecs = Seq((1L, Array.fill(64)(0.5f))).toDF("vec_id", "embedding")
    val pp = plan(graft.operators.Similarity.randomProject(
      vecs, "vec_id", "embedding", 64, 16, "s"))
    assert(!pp.contains("Exchange"), "projection must not shuffle:\n" + pp)
    assert(!pp.toLowerCase.contains("scalaudf"))
    val qs = vecs.filter(col("vec_id") < 10)
    val p2 = plan(graft.operators.Similarity.projectedRerankTopK(
      vecs, qs, 5, 20, 64, 16, "s"))
    assert(!p2.contains("CartesianProduct"), p2)
    assert(p2.contains("BroadcastNestedLoopJoin") ||
      p2.contains("BroadcastHashJoin"),
      "the probe side must broadcast:\n" + p2)
    assert(!p2.toLowerCase.contains("scalaudf"))
  }

  test("maintained winnow form: the df prune never re-aggregates the " +
      "base population (the r17 O(base) debt, pinned structurally)") {
    // distinguishable leaves: base index/stats vs the delta's fps
    val baseFps = (1L to 50L).map(i => (i, i * 7L)).toDF("doc_id", "fp")
      .as("base_fps_leaf")
    val baseStats = (1L to 50L).map(i => (i * 7L, 1L)).toDF("fp", "_df")
    val deltaFps = (100L to 110L).map(i => (i, i * 3L)).toDF("doc_id", "fp")
    val out = graft.operators.Corpus.incrementalWinnowMatchesFromFps(
      baseFps, baseStats, deltaFps, "doc_id", 2L, 100L)
    val lp = out.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation}
    // identify each in-memory leaf by its materialized row count
    def leafSizes(
        n: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[Int] =
      n.collect { case l: LocalRelation => l.data.size }
    val aggs = lp.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty)
    // every fp-keyed aggregate (the df prune) must see ONLY delta-sized
    // leaves (11 rows) — a regression to the r17 shape would pull the
    // 50-row base index or stats under a df aggregate
    val dfPrunes = aggs.filter(a => a.groupingExpressions.size == 1 &&
      a.groupingExpressions.head.references.map(_.name).toSeq == Seq("fp"))
    assert(dfPrunes.nonEmpty, lp.toString)
    dfPrunes.foreach { a =>
      assert(leafSizes(a.child).forall(_ == 11),
        s"df prune must aggregate the DELTA only:\n$a")
    }
    // the base leaves are consumed by JOINS only (probe/lookup), never
    // under any aggregate except the final pair count, whose grouping
    // is (d1, d2)
    aggs.filterNot(dfPrunes.contains).foreach { a =>
      assert(a.groupingExpressions.size == 2, a.toString)
    }
  }
}
