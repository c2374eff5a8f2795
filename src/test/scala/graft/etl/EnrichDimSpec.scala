package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** grabAll for the two dimension types, recordsets and publishers
  * (conversions.py:932-964 over the field tables :162-188), including the
  * one "custom"-typed field in the whole schema: recordsets.contacts, a
  * nested object list (conversions.py:190-203) that verbatimGrabber
  * passes through untouched. */
class EnrichDimSpec extends SparkSpec {
  import spark.implicits._

  private def rsRaw(contacts: Column) =
    Seq(1L).toDF("id").select(
      col("id"),
      map(
        lit("idigbio:uuid"), lit("RS-A1 "),
        lit("idigbio:dateModified"), lit("2024-03-05T00:00:00"),
        lit("idigbio:version"), lit("V7"),
        lit("collection_name"), lit("Fish Collection"),
        lit("data_rights"), lit("CC0"),
        lit("link"), lit("http://Archive.example/a.zip"),
        lit("eml_link"), lit("http://EML.example/a.xml"),
        lit("logo_url"), lit("http://logo.example/a.png")).as("data"),
      lit("pub-1").as("parent"),
      contacts.as("contacts"))

  test("recordsets grabAll: verbatim lower/strip, int/date grabs, parent") {
    val c = array(struct(
      lit("Ann").as("first_name"), lit("Smith").as("last_name"),
      lit("ann@example.org").as("email"), lit("Data Manager").as("role")))
    val r = Enrich.recordsets(rsRaw(c)).collect().head
    assert(r.getAs[String]("uuid") == "rs-a1")
    assert(r.getAs[String]("name") == "fish collection")
    assert(r.getAs[Long]("version") == 7L)
    assert(r.getAs[String]("publisher") == "pub-1")
    assert(r.getAs[String]("rights") == "cc0")
    assert(r.getAs[String]("archivelink") == "http://archive.example/a.zip")
    assert(r.getAs[String]("emllink") == "http://eml.example/a.xml")
    assert(r.getAs[String]("logourl") == "http://logo.example/a.png")
    assert(r.getAs[java.sql.Timestamp]("datemodified").toString
      .startsWith("2024-03-05"))
    assert(r.getAs[Double]("dqs") == 0.0)
  }

  test("recordsets contacts: nested list passes through with the custom-mapping schema") {
    val c = array(
      struct(lit("Ann").as("first_name"), lit("Smith").as("last_name"),
        lit("ann@example.org").as("email"), lit("Curator").as("role")),
      struct(lit("Bo").as("first_name"), lit("Li").as("last_name"),
        lit("bo@example.org").as("email"), lit("Collection Manager").as("role")))
    val out = Enrich.recordsets(rsRaw(c))
    val ct = out.schema("contacts").dataType
    // the nested shape the reference's custom_mappings declares
    val fields = ct.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq
    assert(fields == Seq("first_name", "last_name", "email", "role"))
    val got = out.select(col("contacts")).collect().head.getSeq[Row](0)
    assert(got.map(_.getAs[String]("email")) ==
      Seq("ann@example.org", "bo@example.org"))
    assert(got.head.getAs[String]("role") == "Curator") // NOT lowercased
  }

  test("recordsets contacts: absent column yields typed null") {
    val out = Enrich.recordsets(rsRaw(lit(null).cast(Enrich.contactsType))
      .drop("contacts"))
    assert(out.schema("contacts").dataType.simpleString ==
      "array<struct<first_name:string,last_name:string,email:string,role:string>>")
    assert(out.select(col("contacts")).collect().head.isNullAt(0))
  }

  test("publishers grabAll: name, recordsets from siblings, version grab") {
    val raw = Seq(1L).toDF("id").select(
      col("id"),
      map(
        lit("idigbio:uuid"), lit("PUB-9"),
        lit("name"), lit("Museum of Natural History"),
        lit("idigbio:dateModified"), lit("2023-01-02 12:30:00"),
        lit("idigbio:version"), lit("3")).as("data"),
      map(lit("recordset"), array(lit("rs-1"), lit("rs-2"))).as("siblings"))
    val r = Enrich.publishers(raw).collect().head
    assert(r.getAs[String]("uuid") == "pub-9")
    assert(r.getAs[String]("name") == "museum of natural history")
    assert(r.getAs[Long]("version") == 3L)
    assert(r.getAs[scala.collection.Seq[String]]("recordsets").toSeq ==
      Seq("rs-1", "rs-2"))
    assert(r.getAs[Double]("dqs") == 0.0)
  }

  test("harvest integration: EML parse feeds the recordsets enrich end-to-end") {
    // the real composition: RSS gives link/eml_link, EML gives
    // collection_name/rights/logo/contacts, Enrich.recordsets types it
    val eml =
      """<eml><dataset>
        |  <title>Example Fish Collection</title>
        |  <intellectualRights>CC0</intellectualRights>
        |  <creator>
        |    <individualName><givenName>Ann</givenName><surName>Smith</surName></individualName>
        |    <electronicMailAddress>ann@example.org</electronicMailAddress>
        |  </creator>
        |  <contact>
        |    <individualName><givenName>Bo</givenName><surName>Li</surName></individualName>
        |    <electronicMailAddress>bo@example.org</electronicMailAddress>
        |  </contact>
        |</dataset></eml>""".stripMargin
    val meta = graft.ingest.Eml.parse(eml)
    val dataEntries: Seq[Column] = Seq(
      Some(lit("idigbio:uuid") -> lit("RS-X")),
      meta.collectionName.map(v => lit("collection_name") -> lit(v)),
      meta.rights.map(v => lit("data_rights") -> lit(v)),
      meta.logoUrl.map(v => lit("logo_url") -> lit(v)),
      Some(lit("link") -> lit("http://ipt.example/archive.do?r=x")),
    ).flatten.flatMap(kv => Seq(kv._1, kv._2))
    val contacts = array(meta.contacts.map(c => struct(
      lit(c.firstName.orNull).as("first_name"),
      lit(c.lastName.orNull).as("last_name"),
      lit(c.email.orNull).as("email"),
      lit(c.role.orNull).as("role"))): _*)
    val raw = Seq(1L).toDF("id").select(col("id"),
      map(dataEntries: _*).as("data"), contacts.as("contacts"))
    val r = Enrich.recordsets(raw).collect().head
    assert(r.getAs[String]("name") == "example fish collection")
    assert(r.getAs[String]("rights") == "cc0")
    assert(r.getAs[String]("archivelink") == "http://ipt.example/archive.do?r=x")
    val got = Enrich.recordsets(raw).select(col("contacts")).collect()
      .head.getSeq[Row](0)
    assert(got.map(c => (c.getAs[String]("email"), c.getAs[String]("role"))) ==
      Seq(("ann@example.org", "creator"), ("bo@example.org", "contact")))
  }

  test("publishers: missing siblings yields null recordsets list") {
    val raw = Seq(1L).toDF("id").select(
      col("id"), map(lit("name"), lit("P")).as("data"))
    val r = Enrich.publishers(raw).collect().head
    assert(r.isNullAt(r.fieldIndex("recordsets")))
  }
}
