package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("histogram: buckets cover [lo, hi], hi lands in the last bucket, " +
      "counts total to the group size, empty buckets omitted") {
    val s = spark
    import s.implicits._
    // g1: 0..31 → 16 buckets of width 2; g2: constant value
    val df = ((0 until 32).map(v => ("g1", v.toLong)) ++
      Seq(("g2", 7L), ("g2", 7L))).toDF("g", "v")
    val r = Profile.histogram(df, "g", "v", 16).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    val g1 = r.filter(_._1 == "g1")
    assert(g1.length === 16)
    assert(g1.forall(_._5 === 2L)) // width-2 buckets, 2 values each
    assert(g1.map(_._2).sorted.toSeq === (0L until 16L))
    assert(g1.forall(t => t._3 === 0L && t._4 === 31L))
    // constant group: everything in bucket 0 of a degenerate [7,7] range
    val g2 = r.filter(_._1 == "g2")
    assert(g2.toSeq === Seq(("g2", 0L, 7L, 7L, 2L)))
  }

  test("histogram: bucket arithmetic is exact integers (negative lows, " +
      "max value never overflows into bucket B)") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", -10L), ("g", 0L), ("g", 9L)).toDF("g", "v")
    val r = Profile.histogram(df, "g", "v", 4).collect()
      .map(x => x.getLong(1) -> x.getLong(4)).toMap
    // range [-10, 9], divisor 20, width 5: -10→0, 0→2, 9→3
    assert(r === Map(0L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("keySkew: uniform keys read ~1.0; a hot key reads max_cnt*k/n; " +
      "hot-key pick deterministic under ties") {
    val s = spark
    import s.implicits._
    val uniform = (1 to 100).flatMap(k => Seq.fill(10)(s"k$k")).toDF("k")
    val u = Profile.keySkew(uniform, "k").head()
    assert(u.getAs[Long]("n_rows") === 1000L)
    assert(u.getAs[Long]("n_keys") === 100L)
    assert(u.getAs[Long]("max_cnt") === 10L)
    assert(u.getAs[Double]("skew6") === 1.0)
    // one key at 500 among 99 singletons
    val hot = (Seq.fill(500)("whale") ++ (1 to 99).map(i => s"m$i")).toDF("k")
    val h = Profile.keySkew(hot, "k").head()
    assert(h.getAs[String]("hot_key") === "whale")
    assert(h.getAs[Double]("skew6") ===
      math.rint(500.0 * 100 / 599 * 1e6) / 1e6)
    // tie on max_cnt: lexicographically-last wins, stable
    val tied = Seq("a", "a", "z", "z", "m").toDF("k")
    assert(Profile.keySkew(tied, "k").head().getAs[String]("hot_key") === "z")
  }

  test("entropy: uniform K categories read ln K; single category reads 0; " +
      "partition-layout independent") {
    val s = spark
    import s.implicits._
    val df = ((1 to 40).map(i => ("u", s"c${i % 4}")) ++
      Seq.fill(7)(("solo", "only"))).toDF("g", "c")
    val r = Profile.entropy(df, "g", "c").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("u")._1 === 4L)
    assert(math.abs(r("u")._2 - math.log(4.0)) < 1e-6)
    assert(r("solo") === ((1L, 0.0)))
    val again = Profile.entropy(df.repartition(7), "g", "c").collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(again("u") === r("u")._2 && again("solo") === 0.0)
  }

  test("entropy: skewed distribution matches the closed form") {
    val s = spark
    import s.implicits._
    // p = (3/4, 1/4)
    val df = (Seq.fill(30)(("g", "a")) ++ Seq.fill(10)(("g", "b")))
      .toDF("g", "c")
    val got = Profile.entropy(df, "g", "c").head().getAs[Double]("entropy6")
    val expect = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(got - expect) < 2e-6)
  }

  test("columnProfile: null counts, exact distincts, native-type extrema " +
      "(numeric min is numeric, not lexicographic)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(9L), Some("b")), (Some(10L), None),
      (Some(100L), Some("a")), (None, Some("a"))
    ).toDF("num", "txt")
    val r = Profile.columnProfile(df, Seq("num", "txt")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getString(3), x.getString(4))).toMap
    // lexicographic min would be "10"; numeric min is 9
    assert(r("num") === ((1L, 3L, "9", "100")))
    assert(r("txt") === ((1L, 2L, "a", "b")))
  }

  test("columnProfile plan shape: one single-column pass per profiled " +
      "column, NO multi-distinct Expand (the round-17 adjudication — " +
      "the all-in-one agg multiplied every scan row x(C+1))") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("a", "b")
    val plan = Profile.columnProfile(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"),
      s"per-column single-distinct passes must not plan an Expand:\n$plan")
    // one pruned pass per column (C scans of one column each — total
    // bytes equal the old single wide scan, rows not multiplied)
    val scans = plan.linesIterator.count(l =>
      l.contains("LocalRelation") || l.contains("Relation ["))
    assert(scans === 2, s"one pruned scan per profiled column:\n$plan")
  }

  test("fdProfile: a true key holds; a violated dependency counts its " +
      "violating determinants exactly") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "y", "p"),
      (4L, "y", "p")).toDF("id", "a", "b")
    val r = Profile.fdProfile(df, Seq("id" -> "b", "a" -> "b"))
      .collect().map(x => (x.getString(0), x.getLong(2), x.getLong(3),
        x.getBoolean(4))).toList
    // id -> b: 4 keys, 0 violations (a key); a -> b: x maps to {p,q}
    assert(r.contains(("id", 4L, 0L, true)))
    assert(r.contains(("a", 2L, 1L, false)))
  }

  test("chiSquare: matches brute-force full-grid chi2 on random " +
      "contingency tables (zero cells included)") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7, 77)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 500).map { _ =>
        val x = s"x${rnd.nextInt(4)}"
        // correlated: y biased by x index → real dependence + some
        // (x, y) combinations may never occur
        val y = s"y${(rnd.nextInt(3) + x.last.toString.toInt) % 4}"
        (x, y)
      }
      val got = Profile.chiSquare(rows.toDF("x", "y"), "x", "y").head()
      val xs = rows.map(_._1).distinct.sorted
      val ys = rows.map(_._2).distinct.sorted
      val n = rows.size.toDouble
      val cnt = rows.groupBy(identity).view.mapValues(_.size).toMap
      val rm = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val cm = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val chi = (for { x <- xs; y <- ys } yield {
        val o = cnt.getOrElse((x, y), 0).toDouble
        val e = rm(x) * cm(y) / n
        (o - e) * (o - e) / e
      }).sum
      assert(math.abs(got.getAs[Double]("chi26") - chi) < 1e-4,
        s"seed=$seed got=${got.getAs[Double]("chi26")} brute=$chi")
      assert(got.getAs[Long]("n_cells") === xs.size.toLong * ys.size)
      assert(got.getAs[Long]("dof") === (xs.size - 1L) * (ys.size - 1L))
    }
  }

  test("globalNtile: bit-identical to the window ntile on random data " +
      "(remainder tiles included), any partitioning, no unpartitioned " +
      "window over the data") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(13, 31); n <- Seq(4, 5, 7)) {
      val rnd = new scala.util.Random(seed)
      // 103 rows: prime -> every tile count hits the remainder logic
      val df = (1 to 103).map(i => (i.toLong, rnd.nextInt(40).toLong))
        .toDF("id", "v").repartition(7)
      val got = Profile.globalNtile(df, "v", "id", n, c => c, "t")
        .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      val expect = df.withColumn("t",
          ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
      assert(got === expect, s"seed=$seed n=$n")
    }
    // plan property: the only window in the two-level form partitions
    // by the bucket column — never a global window over the rows
    val df = (1 to 50).map(i => (i.toLong, (i % 9).toLong)).toDF("id", "v")
    val plan = Profile.globalNtile(df, "v", "id", 5, c => c, "t")
      .queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window")).toList
    assert(windows.exists(_.contains("_b")),
      s"expected bucket-partitioned window:\n$plan")
    // the row-level window must carry the _b partition spec; the only
    // unpartitioned one runs on the buckets-sized base relation
    val rowWin = windows.filter(_.contains("row_number"))
    assert(rowWin.nonEmpty && rowWin.forall(_.contains("_b")),
      s"row rank must be bucket-partitioned:\n$plan")
  }

  test("fdProfile: null dependents do not witness violations (the " +
      "count-DISTINCT convention)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("p")), (1L, None), (2L, Some("q")))
      .toDF("d", "v")
    val r = Profile.fdProfile(df, Seq("d" -> "v")).head()
    assert(r.getLong(2) === 2L && r.getLong(3) === 0L && r.getBoolean(4))
  }

  test("inclusionCheck: null keys excluded on both sides (NOT-IN " +
      "collapse pinned away)") {
    val s = spark
    import s.implicits._
    val a = Seq(Some(1L), None, Some(99L)).toDF("k")
    val b = Seq(Some(1L), None).toDF("j")
    val r = Profile.inclusionCheck(a, "k", b, "j").head()
    assert(r.getLong(0) === 2L) // {1, 99}: nulls out of scope
    assert(r.getLong(1) === 1L) // 99 missing — b's null hides nothing
  }

  test("inclusionCheck: exact missing count and containment flag") {
    val s = spark
    import s.implicits._
    val a = Seq(1L, 2L, 3L, 3L, 99L).toDF("k")
    val b = (1L to 50L).toDF("j")
    val r = Profile.inclusionCheck(a, "k", b, "j").head()
    assert(r.getLong(0) === 4L)      // distinct {1,2,3,99}
    assert(r.getLong(1) === 1L)      // 99 missing
    assert(!r.getBoolean(2))
    val r2 = Profile.inclusionCheck(a.where(col("k") < 50), "k", b, "j")
      .head()
    assert(r2.getBoolean(2))
  }

  test("sampledMean: sample is deterministic, estimate near exact on a " +
      "uniform group, groups with empty samples dropped") {
    val s = spark
    import s.implicits._
    val df = (1 to 5000).map(i => ("g", i.toLong, (i % 100).toLong))
      .toDF("grp", "id", "v")
    val r = Profile.sampledMean(df, "grp", "v", "id", pct = 10).head()
    assert(r.getLong(1) === 5000L)
    val nSample = r.getLong(2)
    assert(math.abs(nSample - 500L) < 120, s"sample size $nSample")
    assert(math.abs(r.getDouble(4) - r.getDouble(3)) < 5.0)
    val again = Profile.sampledMean(df.repartition(7), "grp", "v", "id", 10)
      .head()
    assert(again.getLong(2) === nSample &&
      again.getDouble(4) === r.getDouble(4))
    // a group whose rows all miss the sample is dropped, never NaN
    val tiny = Seq(("t", 4L, 7L)).toDF("grp", "id", "v")
    assert(Profile.sampledMean(df.union(tiny), "grp", "v", "id", 10)
      .collect().forall(x => !x.getDouble(4).isNaN))
  }

  test("chiSquare: independent columns read ~0; a perfectly dependent " +
      "pair reads n·(min(r,c)−1); dof correct") {
    val s = spark
    import s.implicits._
    // independent: every (x, y) combination equally often
    val ind = (for { x <- Seq("a", "b"); y <- Seq("p", "q", "r");
      _ <- 1 to 5 } yield (x, y)).toDF("x", "y")
    val ri = Profile.chiSquare(ind, "x", "y").head()
    assert(ri.getAs[Double]("chi26") === 0.0)
    assert(ri.getAs[Long]("dof") === 2L)
    assert(ri.getAs[Long]("n_cells") === 6L)
    // dependent: y determined by x → chi2 = n·(k−1) for k×k
    val dep = (for { x <- Seq("a", "b"); _ <- 1 to 10 }
      yield (x, x.toUpperCase)).toDF("x", "y")
    val rd = Profile.chiSquare(dep, "x", "y").head()
    assert(rd.getAs[Double]("chi26") === 20.0) // n·(2−1) = 20
    assert(rd.getAs[Long]("dof") === 1L)
  }

  test("trendSlope: recovers an exact linear signal; constant series " +
      "reads slope 0; single-timestamp group filtered") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // u1: y = 2·x(seconds) + 5 → slope = 2 cents/s = 172800/day
    // u2: constant; u3: one instant only (den 0 → dropped)
    val rows = (0L to 10L).map(i => ("u1", ts(i * 60), 2 * i * 60 + 5)) ++
      (0L to 10L).map(i => ("u2", ts(i * 60), 42L)) ++
      Seq(("u3", ts(0), 1L), ("u3", ts(0), 9L))
    val df = rows.toDF("g", "ts", "y")
    val r = Profile.trendSlope(df, "g", "ts", "y").collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("u1") === 172800.0)
    assert(r("u2") === 0.0)
    assert(!r.contains("u3"))
  }

  test("quantileBins: quartiles balanced, order deterministic, every " +
      "row assigned") {
    val s = spark
    import s.implicits._
    val df = (1 to 40).map(i => (i.toLong, "g", (i % 10).toLong))
      .toDF("id", "g", "v")
    val r = Profile.quantileBins(df, "g", "v", "id", 4).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getInt(3)))
    assert(r.length === 40)
    val sizes = r.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes === Map(1 -> 10, 2 -> 10, 3 -> 10, 4 -> 10))
    // bins are monotone in (v, id): max v of bin b <= min v of bin b+1
    val byBin = r.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBin(1).max <= byBin(2).min + 1) // ties may straddle by id
    // determinism under repartitioning
    val again = Profile.quantileBins(df.repartition(7), "g", "v", "id", 4)
      .collect().map(x => (x.getLong(0), x.getInt(3))).toSet
    assert(again === r.map(x => (x._1, x._3)).toSet)
  }

  test("madOutliers + integerOutliers: fresh-seed randomized battery " +
      "against brute-force float formulations") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(47, 83)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 400).map { i =>
        val g = s"g${i % 3}"
        val v = if (rnd.nextDouble() < 0.03) rnd.nextInt(100000).toLong
          else 500L + rnd.nextInt(50)
        (i.toLong, g, v)
      }
      val df = rows.toDF("id", "g", "v")
      // MAD brute
      val madFlag = Profile.madOutliers(df, "g", "v", "id", 3)
        .collect().map(_.getLong(0)).toSet
      val madBrute = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._1))
        val med = sorted((sorted.size - 1) / 2)._3
        val devSorted = rs.map(r => (r._1, math.abs(r._3 - med)))
          .sortBy(r => (r._2, r._1))
        val mad = devSorted((devSorted.size - 1) / 2)._2
        rs.filter(r => math.abs(r._3 - med) > 3 * mad).map(_._1)
      }.toSet
      assert(madFlag === madBrute, s"seed=$seed")
      // integer z-score brute
      val zFlag = Corpus.integerOutliers(df, "g", "v", 3)
        .select("id").collect().map(_.getLong(0)).toSet
      val zBrute = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val vs = rs.map(_._3.toDouble)
        val mean = vs.sum / vs.size
        val varP = vs.map(x => (x - mean) * (x - mean)).sum / vs.size
        rs.filter { case (_, _, v) =>
          (v - mean) * (v - mean) > 9.0 * varP }.map(_._1)
      }.toSet
      assert(zFlag === zBrute, s"seed=$seed z")
    }
  }

  test("trendSlope + quantileBins: fresh-seed battery against brute " +
      "formulations") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(59)
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val rows = (1 to 300).map { i =>
      val g = s"u${i % 4}"
      val x = rnd.nextInt(100000).toLong
      (g, ts(x), x, (3 * x + rnd.nextInt(1000)).toLong)
    }
    val got = Profile.trendSlope(rows.map(r => (r._1, r._2, r._4))
        .toDF("g", "ts", "y"), "g", "ts", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val t0 = rows.map(_._3).min
      val xs = rs.map(r => (r._3 - t0).toDouble)
      val ys = rs.map(_._4.toDouble)
      val n = xs.size
      val slope = (n * xs.zip(ys).map(p => p._1 * p._2).sum -
        xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
      // y = 3x + noise: slope ~3 cents/s = 259200/day
      assert(math.abs(got(g) - slope * 86400) < 1.0, s"$g")
      assert(math.abs(got(g) - 259200.0) < 26000.0, s"$g far from signal")
    }
    // ntile balance on a random column
    val b = Profile.quantileBins(rows.map(r => (r._3, r._1, r._4))
      .toDF("id", "g", "v"), "g", "v", "id", 5)
    val sizes = b.groupBy("g", "bin").count().collect().map(_.getLong(2))
    assert(sizes.max - sizes.min <= 1,
      "ntile bins must stay balanced within 1 per group")
  }

  test("categoryDrift: identical snapshots read 0; disjoint read 1; a " +
      "hand-checked shift matches the closed form") {
    val s = spark
    import s.implicits._
    val x = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).toDF("c")
    val same = Profile.categoryDrift(x, x, "c").head()
    assert(same.getAs[Double]("tv6") === 0.0)
    val y = (Seq.fill(2)("a") ++ Seq.fill(8)("b")).toDF("c")
    // TV = ½(|.6−.2| + |.4−.8|) = 0.4
    val shift = Profile.categoryDrift(x, y, "c").head()
    assert(shift.getAs[Double]("tv6") === 0.4)
    assert(shift.getAs[Long]("n_a") === 10L)
    assert(shift.getAs[Long]("n_cats") === 2L)
    val z = Seq.fill(5)("zzz").toDF("c")
    assert(Profile.categoryDrift(x, z, "c").head()
      .getAs[Double]("tv6") === 1.0)
  }

  test("categoryDrift: top drifted category is deterministic") {
    val s = spark
    import s.implicits._
    val a = (Seq.fill(10)("p") ++ Seq.fill(10)("q")).toDF("c")
    val b = (Seq.fill(20)("p")).toDF("c")
    // cross terms: p: |10·20 − 20·20| = 200; q: |10·20 − 0| = 200 — tie
    // breaks to the LARGER category string: q
    assert(Profile.categoryDrift(a, b, "c").head()
      .getAs[String]("top_cat") === "q")
  }

  test("madOutliers: flags exactly the rows beyond c·MAD; robust to the " +
      "contamination that drags a mean z-score") {
    val s = spark
    import s.implicits._
    // 9 values near 100 + one absurd 10000: med=100, MAD small, the
    // absurd row flags; a 2-sigma MEAN rule would be dragged by it
    val rows = Seq((1L, "g", 98L), (2L, "g", 99L), (3L, "g", 100L),
      (4L, "g", 100L), (5L, "g", 100L), (6L, "g", 101L), (7L, "g", 101L),
      (8L, "g", 102L), (9L, "g", 97L), (10L, "g", 10000L))
    val df = rows.toDF("id", "g", "v")
    val flagged = Profile.madOutliers(df, "g", "v", "id", c = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    // sorted values: 97,98,99,100,100,100,101,101,102,10000 → type-1
    // median = index floor(9/2)=4 (0-based) = 100; devs sorted:
    // 0,0,0,1,1,1,2,2,3,9900 → MAD = 1; flag dev > 3
    assert(flagged.map(_._1).toSeq === Seq(10L))
    assert(flagged(0)._2 === 100L && flagged(0)._3 === 1L)
    // the mean-rule contrast: integerOutliers at z=2 flags NOTHING
    // else either way here, but the MAD med/mad pair is untouched by
    // the contaminant while the mean (1089.8) is dragged past every
    // clean value
    val mean = rows.map(_._3).sum.toDouble / rows.size
    assert(mean > 1000.0)
  }

  test("madOutliers: per-group medians independent; deterministic " +
      "under repartitioning") {
    val s = spark
    import s.implicits._
    val df = ((1 to 20).map(i => (i.toLong, "a", i.toLong)) ++
      (21 to 40).map(i => (i.toLong, "b", 5L))).toDF("id", "g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Profile.madOutliers(d, "g", "v", "id", 2)
        .collect().map(_.getLong(0)).toSet
    assert(run(df.repartition(1)) === run(df.repartition(7)))
    // constant group b: mad 0, every dev 0 → no flags from b
    assert(!run(df).exists(_ > 20L))
  }

  test("joinCardinality: exact when both key domains fit inside k") {
    val s = spark
    import s.implicits._
    // a: keys 1..30 with multiplicity 4; b: keys 21..50 with mult 2
    // matching keys 21..30 → true = 10 * 4 * 2 = 80
    val a = (1 to 30).flatMap(k => Seq.fill(4)(k.toLong)).toDF("ka")
    val b = (21 to 50).flatMap(k => Seq.fill(2)(k.toLong)).toDF("kb")
    val r = Profile.joinCardinality(a, "ka", b, "kb", k = 256).head()
    assert(r.getAs[Long]("true_rows") === 80L)
    assert(r.getAs[Long]("est_keys") === 10L)
    assert(r.getAs[Long]("n_a") === 120L && r.getAs[Long]("d_a") === 30L)
    assert(r.getAs[Long]("n_b") === 60L && r.getAs[Long]("d_b") === 30L)
    // 10 * (120/30) * (60/30) = 80 — the independence model is exact
    // here because multiplicities are constant per side
    assert(r.getAs[Long]("est_rows") === 80L)
  }

  test("joinCardinality: estimate lands in band above k, and correctly " +
      "reads zero for disjoint domains") {
    val s = spark
    import s.implicits._
    val a = (1 to 3000).map(_.toLong).toDF("ka")
    val b = (2001 to 5000).map(_.toLong).toDF("kb")
    val r = Profile.joinCardinality(a, "ka", b, "kb", k = 256).head()
    assert(r.getAs[Long]("true_rows") === 1000L)
    val est = r.getAs[Long]("est_rows")
    assert(math.abs(est - 1000L).toDouble / 1000 < 0.45, s"est=$est")
    val d = Profile.joinCardinality(a, "ka",
      (9001 to 9100).map(_.toLong).toDF("kb"), "kb", 256).head()
    assert(d.getAs[Long]("true_rows") === 0L)
    assert(d.getAs[Long]("est_rows") <= 60L)
  }
}
