package graft.hash

import graft.SparkSpec
import graft.hash.Etags.V
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Byte-exact goldens for calcEtag/objectHasher vs the reference
  * semantics (idb/helpers/etags.py). Expected hex digests were produced
  * with CPython hashlib+json using the exact dumps settings the
  * reference uses (separators=(',',':'), ensure_ascii=False).
  */
class EtagsSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("calcEtag golden: simple record") {
    assert(Etags.calcEtag(Map(
      "dwc:genus" -> "Acer", "dwc:specificEpithet" -> "rubrum")) ===
      "eda5a864ea04e304171c2a875babd4ebbcc8f43f")
  }

  test("calcEtag golden: empty record") {
    assert(Etags.calcEtag(Map.empty[String, String]) ===
      "97d170e1550eee4afc0af065b78cda302a97674c")
  }

  test("calcEtag golden: ensure_ascii=False passes unicode through") {
    assert(Etags.calcEtag(Map("a" -> "ü", "b" -> "日本")) ===
      "6c5021a85bac6c1bf4c77360fce835fb67fcad9d")
  }

  test("calcEtag golden: python escape sequences") {
    assert(Etags.calcEtag(Map("k" -> "line1\nline2\ttab\"quote\\back")) ===
      "eb99b59e552651dc5f6ec37e6fe4b85ba1180ea9")
  }

  test("calcEtag sorts keys (insertion order irrelevant)") {
    val h = "d37f8a79e6948a5c4ec107e6143cc283d821d2a6"
    assert(Etags.calcEtag(Seq("b" -> V.S("2"), "a" -> V.S("1"))) === h)
    assert(Etags.calcEtag(Seq("a" -> V.S("1"), "b" -> V.S("2"))) === h)
  }

  test("calcEtag golden: nested list and object values") {
    assert(Etags.calcEtag(Seq(
      "a" -> V.L(Seq(V.S("x"), V.S("y"))),
      "b" -> V.O(Seq("c" -> V.S("d"))))) ===
      "7732b1946a4d2107a0f93a578ace8f45163f189e")
  }

  test("calcEtag golden: number/bool/null serialization") {
    assert(Etags.calcEtag(Seq(
      "n" -> V.I(3), "f" -> V.F(1.5), "t" -> V.B(true), "z" -> V.Null)) ===
      "4b01f7d719a80f7756635ac39cb220015f897348")
  }

  test("objectHasher goldens (etags.py:41-79)") {
    import Etags.objectHasher
    assert(objectHasher("sha1", V.O(Seq("a" -> V.S("b")))) ===
      "45b56fd167edad7f84d0ed5bbb0b74fe25b9fb0f")
    assert(objectHasher("md5", V.O(Seq("a" -> V.S("b")))) ===
      "57e9f61da712c151b9d535392036223f")
    assert(objectHasher("sha1", V.L(Seq(V.S("b"), V.S("a")))) ===
      "b7d99985b3cf2b2e59215451e8b633a6671bd533")
    assert(objectHasher("sha1", V.L(Seq(V.S("b"), V.S("a"))), sortArrays = true) ===
      "5463504435e4dbf2b93a3a8a00ca78e36ea40e24")
    assert(objectHasher("sha1", V.O(Seq(
      "outer" -> V.O(Seq("b" -> V.S("2"), "a" -> V.L(Seq(V.S("y"), V.S("x"))))),
      "n" -> V.I(5)))) ===
      "b8b69dd7825aa7b86dc8a1eead870594511061d9")
    assert(objectHasher("sha1", V.I(3)) === "77de68daecd823babbb58edb1c8e14d7106e83bb")
    assert(objectHasher("sha1", V.F(1.5)) === "aa8f289ebe6d4db1b4a1038b8931ec8c2b5399fb")
    assert(objectHasher("sha1", V.Null) === "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    assert(objectHasher("sha1", V.B(true)) === "88b33e4e12f75ac8bf792aebde41f1a090f3a612")
    // the download query-hash shape (v2_download.py:77)
    assert(objectHasher("sha1", V.O(Seq(
      "rq" -> V.O(Seq("genus" -> V.S("acer"))),
      "type" -> V.S("records"))), sortArrays = true) ===
      "4e980240306e34839205072667994e563f19bcc7")
  }

  // --- properties -------------------------------------------------------

  private val kvGen = Gen.mapOf(Gen.zip(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf(Gen.alphaNumStr.map(_.take(20)),
      Gen.oneOf("ü日本", "a\nb", "c\\\"d", ""))))

  test("property: etag is insertion-order independent and deterministic") {
    check(Prop.forAll(kvGen) { m =>
      val a = Etags.calcEtag(m)
      val b = Etags.calcEtag(scala.util.Random.shuffle(m.toSeq).toMap)
      a == b && a.length == 40
    })
  }

  test("property: distinct maps give distinct etags (no trivial collisions)") {
    check(Prop.forAll(kvGen, kvGen) { (m1, m2) =>
      m1 == m2 || Etags.calcEtag(m1) != Etags.calcEtag(m2)
    })
  }

  // --- distributed column variant ---------------------------------------

  test("etagColumn matches driver-side calcEtag byte-for-byte") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      Map("dwc:genus" -> "Acer", "dwc:specificEpithet" -> "rubrum"),
      Map("a" -> "ü", "b" -> "日本"),
      Map("k" -> "line1\nline2\ttab\"quote\\back"),
      Map("b" -> "2", "a" -> "1"),
    )
    val df = rows.map(Tuple1(_)).toDF("data")
    val got = df.select(Etags.etagColumn(col("data"))).collect().map(_.getString(0))
    val want = rows.map(Etags.calcEtag)
    assert(got.toSeq === want)
  }

  test("etagColumn plan is UDF-free (stays in codegen)") {
    val s = spark
    import s.implicits._
    val df = Seq(Map("a" -> "b")).map(Tuple1(_)).toDF("data")
      .select(Etags.etagColumn(col("data")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"))
  }
}
