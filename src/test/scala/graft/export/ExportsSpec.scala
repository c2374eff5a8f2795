package graft.export

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExportsSpec extends SparkSpec {

  test("uuid5 derives the reference's asserted namespaces (identification.py:6-11)") {
    assert(Exports.uuid5(Exports.NamespaceUrl,
      "http://identifiers.idigbio.org/locality") ===
      "e8518454-3e95-5e2f-95b4-e4b25c6ebb53")
    assert(Exports.uuid5(Exports.NamespaceDns, "globalnames.org") ===
      "90181196-fecf-5082-a4c1-411d4f314cda")
  }

  test("uuid5Column matches driver-side uuid5 and java.util.UUID semantics") {
    val s = spark
    import s.implicits._
    val names = Seq("puma concolor", "", "Acer rubrum", "ü日本")
    val df = names.map(Tuple1(_)).toDF("name")
    val got = df.select(Exports.uuid5Column(Exports.gnNamespace, col("name")))
      .collect().map(_.getString(0))
    val want = names.map(Exports.uuid5(Exports.gnNamespace, _))
    assert(got.toSeq === want)
    got.foreach { u =>
      assert(u.charAt(14) === '5') // version nibble
      assert("89ab".contains(u.charAt(19))) // variant nibble
    }
  }

  test("csvFormat: id first, arrays JSON-encoded, nulls empty, long-name headers") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u1", Seq("a", "b"), "somewhere"),
      ("u2", Seq.empty[String], null),
    ).toDF("uuid", "recordids", "locality")
    val out = Exports.csvFormat(df, "records", "uuid", Seq("recordids", "locality"))
    assert(out.columns.toSeq === Seq("uuid", "idigbio:recordIds", "dwc:locality"))
    val rows = out.orderBy("uuid").collect()
    assert(rows(0).getString(1) === """["a","b"]""")
    assert(rows(0).getString(2) === "somewhere")
    assert(rows(1).getString(1) === "[]")
    assert(rows(1).getString(2) === "")
  }

  test("uniquevals capitalizes scientificname and sorts by count desc (download.py:186-198)") {
    val s = spark
    import s.implicits._
    val df = Seq("puma concolor", "puma concolor", "ACER RUBRUM", null)
      .map(Tuple1(_)).toDF("scientificname")
    val rows = Exports.uniquevals(df, "records", "scientificname",
        Exports.identifyScientificName).collect()
    assert(rows(0).getString(1) === "Puma concolor" && rows(0).getLong(2) === 2)
    assert(rows.map(_.getString(1)).toSet === Set("Puma concolor", "Acer rubrum", ""))
    // ids are uuid5 under the globalnames namespace
    assert(rows(0).getString(0) ===
      Exports.uuid5(Exports.gnNamespace, "Puma concolor"))
  }

  test("meta.xml blocks expand CURIEs and mark core/extension (meta_xml.py:1-74)") {
    val core = Exports.makeFileBlock("occurrence.csv",
      Seq("dwc:genus", "idigbio:uuid"), core = true,
      rowType = Exports.rowTypes("records"))
    assert(core.contains("""<core encoding="utf-8""""))
    assert(core.contains("""rowType="http://rs.tdwg.org/dwc/terms/Occurrence""""))
    assert(core.contains("""<field index="1" term="http://rs.tdwg.org/dwc/terms/genus"/>"""))
    assert(core.contains("""<field index="2" term="http://portal.idigbio.org/terms/uuid"/>"""))
    assert(core.contains("""<id index="0" />"""))
    val ext = Exports.makeFileBlock("multimedia.csv", Seq("ac:accessURI"),
      core = false, rowType = Exports.rowTypes("mediarecords"))
    assert(ext.contains("<extension ") && ext.contains("<coreid index=\"0\" />"))
    val meta = Exports.makeMeta(Seq(core, ext))
    assert(meta.startsWith("""<archive xmlns="http://rs.tdwg.org/dwc/text/">"""))
  }

  test("bulk download end-to-end: DSL query → CSV + citations → DwC-A zip (§3.2)") {
    val s = spark
    import s.implicits._
    // store-shaped records
    val records = Seq(
      ("u1", "acer", "united states", "rs-1"),
      ("u2", "acer", "canada", "rs-1"),
      ("u3", "quercus", "united states", "rs-2"),
      ("u4", "pinus", "mexico", "rs-2"),
    ).toDF("uuid", "genus", "country", "recordset")
    // the download request: {"genus": {"type": "term", "value": "acer"}}-ish
    val pred = graft.dsl.Compile.fromJson(
      """{"genus": "acer"}""",
      graft.dsl.Compile.Options(dataNormalized = true))
    val hits = records.where(pred)
    // occurrence CSV with long-name headers + citation counts
    val csvRows = Exports.csvFormat(hits, "records", "uuid", Seq("genus", "country"))
      .collect().map(_.toSeq.mkString(","))
    val cites = Exports.citationCounts(hits, "recordset")
      .collect().map(r => s"${r.get(0)},${r.get(1)}")
    val meta = Exports.makeMeta(Seq(
      Exports.makeFileBlock("occurrence.csv", Seq("dwc:genus", "dwc:country"),
        core = true, rowType = "dwc:Occurrence")))
    val tmp = java.nio.file.Files.createTempDirectory("dl").toString
    val path = s"$tmp/download.zip"
    Exports.writeDwcaZip(path, Map(
      "meta.xml" -> meta,
      "occurrence.csv" -> ("id,dwc:genus,dwc:country\n" + csvRows.mkString("\n")),
      "citations.txt" -> cites.mkString("\n")))
    val zf = new java.util.zip.ZipFile(path)
    try {
      def read(n: String): String = new String(
        zf.getInputStream(zf.getEntry(n)).readAllBytes(), "UTF-8")
      assert(read("occurrence.csv").linesIterator.size == 3) // header + 2 hits
      assert(read("citations.txt").contains("rs-1,2"))
      assert(read("meta.xml").contains("occurrence.csv"))
    } finally zf.close()
  }

  test("dwca zip round-trips") {
    val tmp = java.nio.file.Files.createTempDirectory("dwca").toString
    val path = s"$tmp/dwca.zip"
    Exports.writeDwcaZip(path, Map(
      "meta.xml" -> Exports.makeMeta(Seq()),
      "occurrence.csv" -> "id,genus\n1,acer\n"))
    val zf = new java.util.zip.ZipFile(path)
    try {
      val names = zf.entries().asIterator()
      val got = Iterator.continually(names)
        .takeWhile(_.hasNext).map(_.next().getName).toSet
      assert(got === Set("meta.xml", "occurrence.csv"))
    } finally zf.close()
  }
}
