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
}
