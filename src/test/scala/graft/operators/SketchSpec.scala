package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  private def hashedValues(grp: String, vals: Range) = {
    val s = spark
    import s.implicits._
    vals.map(v => (grp, s"$grp-v$v")).toDF("g", "v")
      .select(col("g"), TextDedup.hash60(col("v")).as("h"))
  }

  test("kmv: exact when the group has fewer than k distinct values") {
    val df = hashedValues("a", 0 until 37)
    val r = Sketches.kmv(df, Seq("g"), "h", k = 256)
      .select(col("g"), Sketches.estimate(col("kmv"), 256).as("est"))
      .collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 37L)
  }

  test("kmv: estimate lands within the sketch's error band (k=256)") {
    val n = 5000
    val df = hashedValues("a", 0 until n)
    val est = Sketches.kmv(df, Seq("g"), "h", k = 256)
      .select(Sketches.estimate(col("kmv"), 256))
      .collect()(0).getLong(0)
    // relative error ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - n).toDouble / n < 0.25, s"est=$est for n=$n")
  }

  test("kmv: duplicates do not move the estimate (distinct semantics)") {
    val base = hashedValues("a", 0 until 1000)
    val dup = base.union(base).union(base)
    val e1 = Sketches.kmv(base, Seq("g"), "h", 64)
      .select(Sketches.estimate(col("kmv"), 64)).collect()(0).getLong(0)
    val e2 = Sketches.kmv(dup, Seq("g"), "h", 64)
      .select(Sketches.estimate(col("kmv"), 64)).collect()(0).getLong(0)
    assert(e1 === e2)
  }

  test("kmv: merge of disjoint-slice sketches equals the whole-input sketch") {
    val s = spark
    import s.implicits._
    val all = hashedValues("a", 0 until 2000).cache()
    val part1 = all.where(pmod(col("h"), lit(2)) === 0)
    val part2 = all.where(pmod(col("h"), lit(2)) === 1)
    val whole = Sketches.kmv(all, Seq("g"), "h", 128)
      .select(col("kmv").as("w"))
    val merged = Sketches.kmv(part1, Seq("g"), "h", 128)
      .select(col("g"), col("kmv").as("k1"))
      .join(Sketches.kmv(part2, Seq("g"), "h", 128)
        .select(col("g"), col("kmv").as("k2")), "g")
      .select(Sketches.merge(col("k1"), col("k2"), 128).as("m"))
    val w = whole.collect()(0).getSeq[Long](0)
    val m = merged.collect()(0).getSeq[Long](0)
    assert(w === m)
    all.unpersist()
  }

  test("kmv: per-group sketches are independent") {
    val df = hashedValues("a", 0 until 300).union(hashedValues("b", 0 until 40))
    val r = Sketches.kmv(df, Seq("g"), "h", 256)
      .select(col("g"), size(col("kmv")).as("n"),
        Sketches.estimate(col("kmv"), 256).as("est"))
      .orderBy(col("g")).collect()
    assert(r(0).getString(0) === "a" && r(0).getInt(1) === 256)
    assert(r(1).getString(0) === "b" && r(1).getInt(1) === 40 &&
      r(1).getLong(2) === 40L)
  }

  test("kmv: the aggregate form equals the distinct+heap specification " +
      "row-for-row under any partitioning") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    // duplicates + several groups + skewed sizes
    val rows = (1 to 4000).map(_ =>
      (s"g${rnd.nextInt(3)}", (rnd.nextInt(500) * 2654435761L) >>> 4))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "h").repartition(parts)
      val fast = Sketches.kmv(df, Seq("g"), "h", 64)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val specForm = Sketches.kmvViaDistinct(df, Seq("g"), "h", 64)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(fast === specForm, s"parts=$parts")
    }
  }

  test("kmv: aggregate shuffle carries bounded sketches, no distinct exchange") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => ("g", i.toLong)).toDF("g", "h")
    val p = Sketches.kmv(df, Seq("g"), "h", 32)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_kmv_sketch"),
      s"partial aggregation must fold per task before the exchange:\n$p")
    // the old formulation's first stage was an aggregate KEYED on
    // (group, hash) — the distinct whose exchange carried one row per
    // distinct value. No aggregate may key on _h anymore.
    assert(!p.contains("keys=[g#715, _h") && !"keys=\\[[^]]*_h#".r
      .findFirstIn(p).isDefined,
      s"no (group, hash) distinct stage may remain:\n$p")
  }

  test("kmv spec form: plan uses the bounded TopKPerGroup heap, not a full sort") {
    val df = hashedValues("a", 0 until 100)
    val plan = Sketches.kmvViaDistinct(df, Seq("g"), "h", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(2000))
  }

  test("misra-gries: majority key survives the LOSSY regime (capacity " +
      "2 over 41 distinct keys, multiple partitions)") {
    val s = spark
    import s.implicits._
    // 60 copies of the heavy key + 40 singleton keys, shuffled across
    // 7 partitions: n=100, cap=2 → every key with count > 33 must be
    // in the summary no matter how rows were split or merged
    val rows = scala.util.Random.shuffle(
      List.fill(60)("heavy") ++ (1 to 40).map(i => s"s$i"))
    val df = rows.toDF("word").repartition(7)
    val summary = df
      .agg(graft.functions.MisraGries.misraGries(col("word"), 2).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.cnt")).collect()
    assert(summary.length <= 2)
    val heavy = summary.find(_.getString(0) == "heavy")
    assert(heavy.isDefined, s"majority key lost: ${summary.mkString(",")}")
    // undercount bound: reported >= true − n/(cap+1)
    assert(heavy.get.getLong(1) >= 60L - 100L / 3)
  }

  test("misra-gries: exact regime (capacity >= distinct keys) reports " +
      "exact counts; heavyHitters equals the exact top-k") {
    val s = spark
    import s.implicits._
    val rows = (1 to 30).flatMap(i => List.fill(i)(s"w$i"))
    val df = scala.util.Random.shuffle(rows.toList).toDF("word")
      .repartition(5)
    val summary = df
      .agg(graft.functions.MisraGries.misraGries(col("word"), 64).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.key"), col("e.cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(summary === (1 to 30).map(i => s"w$i" -> i.toLong).toMap)
    val hh = Sketches.heavyHitters(df, "word", 5, 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq === (30 to 26 by -1).map(i => (s"w$i", i.toLong)))
  }

  test("misra-gries: two-pass heavyHitters is exact in the lossy " +
      "regime when the top-k clears the retention floor") {
    val s = spark
    import s.implicits._
    // top-3 keys at 400/300/200 over n≈1500 with cap 15: floor is
    // n/16 ≈ 94 — the tail (100 keys × 6) sits below it, the top-3
    // far above; answers must be exact despite heavy decrements
    val rows = List.fill(400)("a") ++ List.fill(300)("b") ++
      List.fill(200)("c") ++ (1 to 100).flatMap(i => List.fill(6)(s"t$i"))
    val df = scala.util.Random.shuffle(rows).toDF("word").repartition(6)
    val hh = Sketches.heavyHitters(df, "word", 3, 15)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq === Seq(("a", 400L), ("b", 300L), ("c", 200L)))
  }

  private def skewedDocs(n: Int) = {
    val s = spark
    import s.implicits._
    // value = i² — a right-skewed length-like distribution with known
    // exact quantiles (sorted order is just i ascending)
    (1 to n).map(i => ("g", i.toLong, i.toLong * i)).toDF("g", "id", "len")
  }

  test("quantileSketch: exact when the group is smaller than k") {
    val r = Sketches.quantileSketch(skewedDocs(41), "g", "len", "id",
        k = 64, qs = Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect()(0)
    // n=41: p50 index floor(40*.5)=20 → value 21², p90 floor(40*.9)=36 → 37²
    assert(r.getAs[Long]("n_sample") === 41L)
    assert(r.getAs[Long]("p50") === 21L * 21L)
    assert(r.getAs[Long]("p90") === 37L * 37L)
  }

  test("quantileSketch: k=256 sample quantiles land within the rank-error band") {
    val n = 20000
    val r = Sketches.quantileSketch(skewedDocs(n), "g", "len", "id",
        k = 256, qs = Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect()(0)
    // recover the sampled value's true rank: value i² → rank i/n
    def rank(v: Long): Double = math.sqrt(v.toDouble) / n
    // rank se = sqrt(q(1-q)/k): p50 ±3.1%, p90 ±1.9%; allow 4 sigma
    assert(math.abs(rank(r.getAs[Long]("p50")) - 0.5) < 0.125)
    assert(math.abs(rank(r.getAs[Long]("p90")) - 0.9) < 0.075)
  }

  test("quantileSketch: deterministic under repartitioning") {
    val a = Sketches.quantileSketch(skewedDocs(5000).repartition(1),
      "g", "len", "id", 128, Seq("p50" -> 0.5)).collect()(0)
    val b = Sketches.quantileSketch(skewedDocs(5000).repartition(7),
      "g", "len", "id", 128, Seq("p50" -> 0.5)).collect()(0)
    assert(a === b)
  }

  test("quantileSketch: bottom-k samples merge (union's sample = " +
      "bottom-k of concatenated samples)") {
    val s = spark
    import s.implicits._
    val docs = skewedDocs(4000)
    val (partA, partB) = (docs.filter(col("id") % 2 === 0),
      docs.filter(col("id") % 2 === 1))
    def sample(d: org.apache.spark.sql.DataFrame) =
      graft.plans.TopKPerGroup.topK(
        d.select(col("g"), col("len"),
          TextDedup.hash60(col("id").cast("string")).as("_h"),
          col("id").as("_id")),
        Seq("g"), Seq("_h", "_id"), 64, "_r").drop("_r")
    val whole = sample(docs).collect().map(_.toSeq).toSet
    // re-sampling the union of the two part-samples = the whole's sample
    val merged = sample(
        sample(partA).unionAll(sample(partB))
          .select(col("g"), col("len"), col("_id").as("id")))
      .collect().map(_.toSeq).toSet
    assert(merged === whole)
  }

  test("qQuantileRollup: weekly estimate folded from daily sketches " +
      "equals the DIRECT weekly sketch — mergeability identity on the " +
      "events fixture") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.LlmQueries.qQuantileRollup(spark, dir)
      .select("week", "n_sample", "p50_est", "p90_est")
      .collect().map(_.toSeq).toSet
    // direct: bottom-64 of the whole week's stream, no daily stage
    val ev = graft.Tables.events(spark, dir).select(
      date_trunc("week", col("ts")).as("week"),
      col("event_id"),
      floor(col("value") * 100).cast("long").as("cents"),
      TextDedup.hash60(col("event_id").cast("string")).as("h"))
    val w = Window.partitionBy(col("week")).orderBy(col("h"), col("event_id"))
    val direct = ev.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= 64)
      .groupBy(col("week"))
      .agg(sort_array(collect_list(col("cents"))).as("_v"),
        count(lit(1)).as("n_sample"))
      .select(col("week"), col("n_sample"),
        element_at(col("_v"), (floor((col("n_sample") - lit(1))
          .cast("double") * lit(0.5)) + lit(1)).cast("int")).as("p50_est"),
        element_at(col("_v"), (floor((col("n_sample") - lit(1))
          .cast("double") * lit(0.9)) + lit(1)).cast("int")).as("p90_est"))
      .collect().map(_.toSeq).toSet
    assert(got === direct)
  }

  // ---- HyperLogLog register sketch -------------------------------------

  test("hll: estimate lands within the sketch's error band (m=256)") {
    val n = 20000
    val est = Sketches.hll(hashedValues("a", 0 until n), Seq("g"), "h", 256)
      .select(Sketches.hllEstimate(col("hll"), 256))
      .collect()(0).getLong(0)
    // raw-HLL relative error ~1.04/sqrt(256) ≈ 6.5%; allow 4 sigma
    assert(math.abs(est - n).toDouble / n < 0.26, s"est=$est for n=$n")
  }

  test("hll: duplicates never move the registers (idempotent update)") {
    val base = hashedValues("a", 0 until 1500)
    def regs(d: org.apache.spark.sql.DataFrame) =
      Sketches.hll(d, Seq("g"), "h", 128).collect()(0).getSeq[Int](1)
    assert(regs(base) === regs(base.union(base).union(base)))
  }

  test("hll: merge of disjoint-slice sketches equals the whole-input " +
      "sketch, and re-merging a slice twice is harmless") {
    val all = hashedValues("a", 0 until 3000).cache()
    val p1 = all.where(pmod(col("h"), lit(2)) === 0)
    val p2 = all.where(pmod(col("h"), lit(2)) === 1)
    def regs(d: org.apache.spark.sql.DataFrame) =
      Sketches.hll(d, Seq("g"), "h", 128).collect()(0).getSeq[Int](1)
    val (w, r1, r2) = (regs(all), regs(p1), regs(p2))
    val merged = r1.zip(r2).map { case (x, y) => math.max(x, y) }
    assert(merged === w)
    // idempotence: max-merging p1's registers in AGAIN changes nothing —
    // the property KMV's k-bounded union does not have
    val again = merged.zip(r1).map { case (x, y) => math.max(x, y) }
    assert(again === w)
    all.unpersist()
  }

  test("hll: registers are partition-layout independent") {
    val d = hashedValues("a", 0 until 2000)
    def regs(x: org.apache.spark.sql.DataFrame) =
      Sketches.hll(x, Seq("g"), "h", 256).collect()(0).getSeq[Int](1)
    assert(regs(d.repartition(1)) === regs(d.repartition(13)))
  }

  test("hll: estimator replays off the registers as floor(C / Z_int)") {
    val regs = Sketches.hll(hashedValues("a", 0 until 5000), Seq("g"), "h", 256)
    val viaColumn = regs.select(Sketches.hllEstimate(col("hll"), 256))
      .collect()(0).getLong(0)
    // hand fold: Z_int = sum 2^(wBits+1-M_j) as exact integers
    val m = 256
    val wBits = 60 - java.lang.Integer.numberOfTrailingZeros(m)
    val rs = regs.collect()(0).getSeq[Int](1)
    val zInt = rs.map(r => math.pow(2.0, (wBits + 1 - r).toDouble).floor.toLong).sum
    val byHand = math.floor(Sketches.hllConstant(m) / zInt.toDouble).toLong
    assert(viaColumn === byHand)
  }

  // ---- Count-Min frequency sketch --------------------------------------

  private def keyStream(seed: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    // zipfish: key k<i> appears ~ i times
    (1 to 60).flatMap(i => Seq.fill(i)(s"k$i")).map(k => (k, rnd.nextInt()))
      .map(_._1).toDF("k")
  }

  test("countMin: never underestimates any key, exact at generous width") {
    val df = keyStream(7).cache()
    val sk = Sketches.countMinSketch(df, "k", depth = 4, width = 1024)
    val truth = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = df.select(col("k")).distinct()
    val ests = Sketches.countMinQuery(sk, probes, "k", 4, 1024).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(ests(k) >= n, s"underestimate for $k")
      // 60 keys across 1024*4 counters: collisions vanishingly likely
      assert(ests(k) === n, s"collision inflated $k: ${ests(k)} vs $n")
    }
    df.unpersist()
  }

  test("countMin: estimates bounded by eps*N even at tight width") {
    val df = keyStream(11).cache()
    val n = df.count()
    val width = 32 // eps = e/32 ≈ 8.5%
    val sk = Sketches.countMinSketch(df, "k", depth = 5, width = width)
    val truth = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ests = Sketches.countMinQuery(sk, df.select("k").distinct(),
      "k", 5, width).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eps = math.E / width
    truth.foreach { case (k, t) =>
      assert(ests(k) >= t)
      assert(ests(k) <= t + (3 * eps * n).toLong,
        s"over-bound blown for $k: ${ests(k)} vs $t (N=$n)")
    }
    df.unpersist()
  }

  test("countMin: matrix is partition-layout independent (element-wise " +
      "sum merge)") {
    val df = keyStream(3)
    def mat(d: org.apache.spark.sql.DataFrame) =
      Sketches.countMinSketch(d, "k", 4, 64).collect()(0).getSeq[Long](0)
    assert(mat(df.repartition(1)) === mat(df.repartition(9)))
  }

  test("countMin: matrix total row-sum per depth row equals N") {
    val df = keyStream(5)
    val n = df.count()
    val m = Sketches.countMinSketch(df, "k", 3, 64).collect()(0).getSeq[Long](0)
    (0 until 3).foreach { d =>
      assert(m.slice(d * 64, (d + 1) * 64).sum === n)
    }
  }

  test("hll + countMin: fresh-seed randomized battery — estimates in " +
      "band and never-underestimate hold across regimes") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(101, 202)) {
      val rnd = new scala.util.Random(seed)
      val n = 3000 + rnd.nextInt(5000)
      val est = Sketches.hll(hashedValues("g", 0 until n), Seq("g"), "h", 256)
        .select(Sketches.hllEstimate(col("hll"), 256))
        .collect()(0).getLong(0)
      assert(math.abs(est - n).toDouble / n < 0.26, s"seed=$seed n=$n est=$est")
      // count-min on a random multiset
      val keys = (1 to 1500).map(_ => s"k${rnd.nextInt(80)}")
      val df = keys.toDF("k").cache()
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk = Sketches.countMinSketch(df, "k", 4, 512)
      val ests = Sketches.countMinQuery(sk, df.select("k").distinct(),
          "k", 4, 512)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, t) =>
        assert(ests(k) >= t, s"seed=$seed underestimate $k") }
      df.unpersist()
    }
  }

  // ---- KMV pairwise overlap --------------------------------------------

  test("kmvOverlap: exact when both groups fit inside k") {
    val s = spark
    import s.implicits._
    // a = {0..99}, b = {50..179}: |a∩b| = 50, |a∪b| = 180
    val df = ((0 until 100).map(v => ("a", s"v$v")) ++
        (50 until 180).map(v => ("b", s"v$v")))
      .toDF("g", "v")
      .select(col("g"), TextDedup.hash60(col("v")).as("h"))
    val r = Sketches.kmvOverlap(df, "g", "h", k = 512).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getString(0) === "a" && row.getString(1) === "b")
    assert(row.getAs[Long]("common") === 50L)
    assert(row.getAs[Long]("est_union") === 180L)
    // below k the merged sample IS the union, so the ratio estimator
    // collapses to the exact intersection
    assert(row.getAs[Long]("est_inter") === 50L)
  }

  test("kmvOverlap: estimates land in band at super-k cardinalities " +
      "and only a<b pairs emit") {
    val s = spark
    import s.implicits._
    val n = 4000; val overlap = 2000
    val df = ((0 until n).map(v => ("a", s"x$v")) ++
        ((n - overlap) until (2 * n - overlap)).map(v => ("b", s"x$v")) ++
        (0 until 100).map(v => ("c", s"y$v")))
      .toDF("g", "v")
      .select(col("g"), TextDedup.hash60(col("v")).as("h"))
    val rows = Sketches.kmvOverlap(df, "g", "h", k = 256).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = rows.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    val trueUnion = 2 * n - overlap
    assert(math.abs(ab.getAs[Long]("est_union") - trueUnion).toDouble
      / trueUnion < 0.3)
    assert(math.abs(ab.getAs[Long]("est_inter") - overlap).toDouble
      / overlap < 0.45)
    // disjoint pair: c shares nothing with a
    val ac = rows.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(ac.getAs[Long]("est_inter") <= 100L)
  }
}
