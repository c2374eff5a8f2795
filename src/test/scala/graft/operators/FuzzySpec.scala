package graft.operators

import graft.SparkSpec

class FuzzySpec extends SparkSpec {

  private def brute(names: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (i1, s1) <- names; (i2, s2) <- names
      if i1 < i2
      dist = lev(s1, s2) if dist <= d
    } yield (i1, i2, dist)).toSet
  }

  private def run(names: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    Fuzzy.editDistanceJoin(names.toDF("id", "name"), "id", "name", d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("recall 1 on hot-prefix names (the naive-blocking failure mode)") {
    // everything shares the long common prefix; only the digit tail
    // distinguishes — the prefix filter must still key on RARE grams
    val names = (0L until 60L).map(i => i -> f"Collection#${i}%05d record")
    assert(run(names, 1) === brute(names, 1))
  }

  test("repeated grams are multiset-counted (aa#2 distinguishes aaa from aa)") {
    val names = Seq(1L -> "aaaa", 2L -> "aaab", 3L -> "abab", 4L -> "bbbb",
      5L -> "aaba", 6L -> "xyzw")
    assert(run(names, 1) === brute(names, 1))
    assert(run(names, 2) === brute(names, 2))
  }

  test("mixed lengths and maxDist 2 agree with brute force") {
    val words = Seq("spark", "spork", "sparks", "sharp", "park", "stark",
      "start", "smart", "apark", "spars", "sparse", "parse", "arcs")
    val names = words.zipWithIndex.map { case (w, i) => i.toLong -> w }
    assert(run(names, 2) === brute(names, 2))
  }

  test("length-diff beyond maxDist never verifies") {
    val names = Seq(1L -> "ab", 2L -> "abcdefgh")
    assert(run(names, 2) === Set.empty)
  }

  test("snmLinkage: candidate set is exactly the n·w rank window " +
      "(threshold 0 keeps every candidate) and matches a brute-force " +
      "rank-window JW sweep") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val names = (1L to 60L).map { i =>
      i -> (1 to 3).map(_ =>
        "abcdef".charAt(rnd.nextInt(6)).toString * (rnd.nextInt(3) + 2))
        .mkString(" ")
    }
    val df = names.toDF("rec_id", "name")
    val w = 5
    val got = Fuzzy.snmLinkage(df, "rec_id", "name", window = w,
        threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute force: global (key16, id) order, each row pairs with its
    // next w neighbors, scored by the same kernel
    val ordered = names.sortBy { case (id, n) => (n.take(16), id) }
    val expect = (for {
      i <- ordered.indices
      j <- (i + 1) to math.min(i + w, ordered.size - 1)
    } yield {
      val (ia, na) = ordered(i); val (ib, nb) = ordered(j)
      val jw = graft.functions.StringSimKernel.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(na),
        org.apache.spark.unsafe.types.UTF8String.fromString(nb))
      (math.min(ia, ib), math.max(ia, ib),
        BigDecimal(jw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }).toSet
    assert(got.size === expect.size, "candidate count must be the full rank window")
    assert(got === expect)
  }

  test("q_linkage gate corpus: non-ASCII (multi-byte) twins are present " +
      "in the matched pairs and dirty ids never collide with real keys") {
    val rows = graft.queries.Relational
      .qLinkage(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // every 7th custkey carries the "Cüstömer#" multi-byte prefix; its
    // twin pair surviving proves the byte-parity JW contract is under
    // the gate, not just the unit fuzz
    assert(rows.exists { case (a, _) => a % 7 == 0 },
      "accented twins must appear in the matched set")
    // full twin recall under the dynamic max(custkey) offset — the
    // accenting must not break the reversed-key blocking, and every
    // planted twin (k, k + max) must be matched, accented or not
    val keys = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey").collect().map(_.getLong(0))
    val mx = keys.max
    val pairSet = rows.toSet
    keys.foreach { k =>
      assert(pairSet.contains((k, k + mx)), s"missing twin for custkey $k")
    }
  }

  test("snmLinkage: plan is blocking-bounded — rank equi-join, no " +
      "cartesian/nested-loop, bases broadcast") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 20L).map(i => i -> s"name$i").toDF("rec_id", "name")
    val p = Fuzzy.snmLinkage(df, "rec_id", "name", 4, 0.9)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), "bucket bases must broadcast:\n" + p)
  }
}
