package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonLinesSpec extends SparkSpec {

  test("read: good lines parse, bad lines flag and keep their raw text") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val f = java.nio.file.Paths.get(dir, "recs.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"id": "u1", "data": {"dwc:genus": "Acer", "dwc:specificEpithet": "rubrum"}}""",
      """{"id": "u2", "data": {}}""",
      """this is not json at all""",
      """{"id": "u3"}""",                       // shapeless: data missing
      """{"id": "u4", "data": {"dwc:genus": "Quercus"}}"""))
    val out = JsonLines.read(spark, f.toString).collect()
      .map(r => (r.getString(0), r.getSeq[String](2).toSeq,
        r.getString(3))).sortBy(_._3)
    assert(out.length === 5)
    val good = out.filter(_._2.isEmpty).map(_._1).toSet
    assert(good === Set("u1", "u2", "u4"))
    val bad = out.filter(_._2 == Seq("json_parse_error"))
    assert(bad.map(_._3).exists(_.startsWith("this is not json")))
    assert(bad.exists(_._3.contains("\"u3\"")), "shapeless line must flag")

    // the parsed map feeds the enrich pipeline directly
    val df = JsonLines.read(spark, f.toString)
      .filter(size(col("flags")) === 0)
      .select(col("id"), col("data"))
    val genus = graft.etl.Enrich.records(
        df.withColumn("id", xxhash64(col("id"))))
      .select(col("genus")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSet
    assert(genus.contains("acer") && genus.contains("quercus"))
  }

  test("write/read roundtrip preserves (id, data) exactly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl2").toString + "/out"
    val recs = Seq(
      ("a", Map("dwc:genus" -> "Acer", "dwc:country" -> "United States")),
      ("b", Map("k" -> """tricky "quotes" and, commas""")),
      ("c", Map.empty[String, String]))
      .toDF("id", "data")
    JsonLines.write(recs, "id", "data", dir)
    val back = JsonLines.read(spark, dir)
    assert(back.filter(size(col("flags")) > 0).count() === 0)
    val got = back.select(col("id"), col("data"))
      .collect().map(r => r.getString(0) ->
        r.getMap[String, String](1).toMap).toMap
    assert(got === Map(
      "a" -> Map("dwc:genus" -> "Acer", "dwc:country" -> "United States"),
      "b" -> Map("k" -> """tricky "quotes" and, commas"""),
      "c" -> Map.empty))
  }

  test("roundtrip survives newlines, tabs, unicode, backslashes and " +
      "null map values — the q_jsonl fidelity classes") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl3").toString + "/out"
    val recs = Seq(
      ("nl", Map("text" -> "line one\nline two\r\nline three")),
      ("tab", Map("text" -> "col1\tcol2")),
      ("uni", Map("text" -> "Ünïcødé — 中文 🌿")),
      ("bs", Map("text" -> """back\slash and \" escapes""")),
      ("nul", Map("present" -> "x", "absent" -> null)))
      .toDF("id", "data")
    JsonLines.write(recs, "id", "data", dir)
    val back = JsonLines.read(spark, dir)
    assert(back.filter(size(col("flags")) > 0).count() === 0)
    // every record stays ONE line: the whole point of the format
    assert(back.count() === 5)
    val got = back.select(col("id"), col("data"))
      .collect().map(r => r.getString(0) ->
        r.getMap[String, String](1).toMap).toMap
    assert(got("nl") === Map("text" -> "line one\nline two\r\nline three"))
    assert(got("tab") === Map("text" -> "col1\tcol2"))
    assert(got("uni") === Map("text" -> "Ünïcødé — 中文 🌿"))
    assert(got("bs") === Map("text" -> """back\slash and \" escapes"""))
    assert(got("nul") === Map("present" -> "x", "absent" -> null))
  }
}
