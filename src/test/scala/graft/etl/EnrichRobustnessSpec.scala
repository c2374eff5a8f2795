package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial no-throw property for the enrich pipelines: under ANSI
  * mode (Spark 4 default) several collection/cast expressions THROW on
  * degenerate data instead of yielding null — the sci_parse parity
  * spec caught exactly such a latent crash (element_at on a
  * single-token name). This spec feeds each pipeline the degenerate
  * shapes the reference's Python handles with None/IndexError-guards:
  * empty data maps, empty sibling edge lists, single-token names,
  * junk in every numeric/date/geo field. */
class EnrichRobustnessSpec extends SparkSpec {

  private def nastyRecords = {
    val s = spark
    import s.implicits._
    Seq(
      // single-token scientific name, no genus → reverse crossfill path
      Map("dwc:scientificName" -> "acer"),
      // empty-string everything
      Map("dwc:scientificName" -> "", "dwc:decimalLatitude" -> "",
        "dwc:eventDate" -> "", "dwc:geodeticDatum" -> "",
        "dwc:minimumElevationInMeters" -> ""),
      // junk in typed fields
      Map("dwc:decimalLatitude" -> "not-a-number",
        "dwc:decimalLongitude" -> "--",
        "dwc:eventDate" -> "13/32/99999",
        "idigbio:dateModified" -> "JANUARY",
        "dwc:year" -> "y", "dwc:month" -> "-", "dwc:day" -> "??",
        "dwc:basisOfRecord" -> "☃", "dwc:taxonRank" -> "☃"),
      // whitespace-only and separator-only date shapes
      Map("dwc:eventDate" -> "   ", "idigbio:dateModified" -> "//",
        "dwc:scientificName" -> " \t "),
      // empty map
      Map.empty[String, String],
    ).zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("id", "data")
  }

  test("records enrich never throws on degenerate rows (incl. empty siblings)") {
    val s = spark
    import s.implicits._
    val withSiblings = nastyRecords.withColumn("siblings",
      map(lit("recordset"), array().cast("array<string>"),
        lit("mediarecord"), array().cast("array<string>")))
    val out = Enrich.records(withSiblings).collect()
    assert(out.length === 5)
    // a genus-only name fills genus (the reference's gnparser fills
    // every part that parsed) but must NOT invent an epithet
    val r0 = Enrich.records(nastyRecords).orderBy("id").collect()(0)
    val flags = r0.getSeq[String](r0.fieldIndex("flags"))
    assert(flags.contains("genus_added"))
    assert(!flags.contains("specificepithet_added"))
    assert(r0.getString(r0.fieldIndex("genus")) === "acer")
    assert(r0.isNullAt(r0.fieldIndex("specificepithet")))
  }

  test("mediarecords / recordsets / publishers enrich never throw") {
    assert(Enrich.mediarecords(nastyRecords).collect().length === 5)
    assert(Enrich.recordsets(nastyRecords).collect().length === 5)
    assert(Enrich.publishers(nastyRecords).collect().length === 5)
  }

  test("NULL data map survives enrich end-to-end (parquet roundtrip, codegen)") {
    val s = spark
    import s.implicits._
    // a nullable parquet map column with an actual null row — the shape
    // PERMISSIVE ingest can produce; the one-pass map kernel must treat
    // it like element_at does (null struct → null fields), not NPE in
    // the generated code
    val dir = java.nio.file.Files.createTempDirectory("nullmap").toString
    Seq((1L, Map("dwc:genus" -> "Acer")), (2L, null))
      .toDF("id", "data").write.mode("overwrite").parquet(dir)
    val back = s.read.parquet(dir)
    val rec = Enrich.records(back).orderBy("id").collect()
    assert(rec.length === 2)
    assert(rec(1).isNullAt(rec(1).fieldIndex("genus")))
    // only the always-present fields (empty commonnames array scores as
    // non-null, like the reference's `is not None` check) contribute
    assert(rec(1).getDouble(rec(1).fieldIndex("dqs")) < 0.05)
    val med = Enrich.mediarecords(back).orderBy("id").collect()
    assert(med.length === 2)
    assert(med(1).isNullAt(med(1).fieldIndex("accessuri")))
  }

  test("store view tolerates empty mediarecords edge lists") {
    val s = spark
    import s.implicits._
    val empty = Seq(1L).toDF("id")
      .select(col("id"),
        map(lit("mediarecords"), array().cast("array<string>")).as("siblings"))
      .select(col("id"),
        org.apache.spark.sql.functions.try_element_at(
          element_at(col("siblings"), "mediarecords"), lit(1)).as("first"))
      .collect()(0)
    assert(empty.isNullAt(1))
  }
}
