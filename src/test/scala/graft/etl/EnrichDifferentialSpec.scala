package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Replays the committed full-record enrich differential vectors
  * (generated once by tools/gen_enrich_differential.py from the
  * REFERENCE's own grabAll under the calibrate_enrich sandbox stubs)
  * through Enrich.records — field-level reference parity as a
  * regression gate without Python at test time. Stub asymmetries
  * (datum, gnparser reverse crossfill, reverse geocoding) are
  * excluded at generation time; regenerate with the tool if the
  * enrich surface grows. */
class EnrichDifferentialSpec extends SparkSpec {

  test("Enrich.records agrees with 1500 recorded reference grabAll runs (three seeds)") {
    val s = spark
    import s.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    // both seed batches; the second's ids offset past the first's range
    val parsed = Seq("/enrich_vectors.jsonl" -> 0L,
        "/enrich_vectors2.jsonl" -> 100000L,
        // third unseen seed (5151), added round 12 — first-run pass
        "/enrich_vectors3.jsonl" -> 200000L).flatMap { case (res, off) =>
      val url = getClass.getResource(res)
      scala.io.Source.fromURL(url).getLines().toSeq
        .map(l => off -> JsonMethods.parse(l))
    }
    assert(parsed.length === 1500)
    val inputs = parsed.map { case (off, j) =>
      ((j \ "id").extract[Long] + off, (j \ "data").extract[Map[String, String]])
    }
    val exps = parsed.map { case (off, j) =>
      ((j \ "id").extract[Long] + off, j \ "exp")
    }.toMap

    val out = Enrich.records(inputs.toDF("id", "data")).select(
      col("id"),
      unix_micros(col("datecollected")).as("datecollected"),
      col("startdayofyear"), col("eventdate"),
      col("minelevation"), col("maxelevation"),
      col("mindepth"), col("maxdepth"),
      col("individualcount"), col("coordinateuncertainty"),
      col("basisofrecord"), col("taxonrank"),
      col("scientificname"), col("genus"), col("specificepithet"),
      array_sort(col("commonnames")).as("commonnames"),
      array_sort(col("associatedsequences")).as("associatedsequences"),
      col("geopoint.lon"), col("geopoint.lat"),
      array_sort(col("flags")).as("flags"),
      round(col("dqs"), 6).as("dqs")).collect()

    val fields = Seq("datecollected", "startdayofyear", "eventdate",
      "minelevation", "maxelevation", "mindepth", "maxdepth",
      "individualcount", "coordinateuncertainty", "basisofrecord",
      "taxonrank", "scientificname", "genus", "specificepithet",
      "commonnames", "associatedsequences")
    out.foreach { r =>
      val id = r.getLong(0)
      val e = exps(id)
      def ok(got: Any, exp: JValue): Boolean = jsonAgree(got, exp)
      fields.zipWithIndex.foreach { case (f, i) =>
        val got = if (r.isNullAt(i + 1)) null else r.get(i + 1)
        assert(ok(got, e \ f), s"id=$id field=$f got=$got exp=${e \ f}")
      }
      val gp = e \ "geopoint"
      val (glon, glat) =
        (if (r.isNullAt(17)) null else r.get(17),
          if (r.isNullAt(18)) null else r.get(18))
      gp match {
        case JArray(List(lon, lat)) =>
          assert(ok(glon, lon) && ok(glat, lat), s"id=$id geopoint")
        case _ => assert(glon == null && glat == null, s"id=$id geopoint null")
      }
      assert(ok(if (r.isNullAt(19)) null else r.get(19), e \ "flags"),
        s"id=$id flags got=${r.get(19)} exp=${e \ "flags"}")
      assert(ok(if (r.isNullAt(20)) null else r.get(20), e \ "dqs"),
        s"id=$id dqs got=${r.get(20)} exp=${e \ "dqs"}")
    }
  }

  test("Enrich.mediarecords agrees with 1500 recorded reference grabAll runs (three seeds)") {
    val s = spark
    import s.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val parsed = Seq("/enrich_media_vectors.jsonl" -> 0L,
        "/enrich_media_vectors2.jsonl" -> 100000L,
        // third unseen seed (5252), added round 12 — first-run pass
        "/enrich_media_vectors3.jsonl" -> 200000L).flatMap { case (res, off) =>
      val url = getClass.getResource(res)
      scala.io.Source.fromURL(url).getLines().toSeq
        .map(l => off -> JsonMethods.parse(l))
    }
    assert(parsed.length === 1500)
    val inputs = parsed.map { case (off, j) =>
      ((j \ "id").extract[Long] + off, (j \ "data").extract[Map[String, String]])
    }
    val exps = parsed.map { case (off, j) =>
      ((j \ "id").extract[Long] + off, j \ "exp") }.toMap
    val fields = Seq("modified", "type", "tag", "format", "mediatype",
      "accessuri", "xpixels", "ypixels", "flags", "dqs")
    val out = Enrich.mediarecords(inputs.toDF("id", "data")).select(
      col("id"),
      unix_micros(col("modified")).as("modified"),
      col("type"), col("tag"), col("format"), col("mediatype"),
      col("accessuri"), col("xpixels"), col("ypixels"),
      array_sort(col("flags")).as("flags"),
      round(col("dqs"), 6).as("dqs")).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      fields.zipWithIndex.foreach { case (f, i) =>
        val got = if (r.isNullAt(i + 1)) null else r.get(i + 1)
        assert(jsonAgree(got, exps(id) \ f),
          s"id=$id field=$f got=$got exp=${exps(id) \ f}")
      }
    }
  }

  private def jnum(v: org.json4s.JValue): Option[Double] = {
    import org.json4s._
    v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
  }

  private def jsonAgree(got: Any, exp: org.json4s.JValue): Boolean = {
    import org.json4s._
    (got, exp) match {
      case (null, JNull) => true
      case (null, _) | (_, JNull) => false
      case (g: Long, j) => jnum(j).contains(g.toDouble)
      case (g: Int, j) => jnum(j).contains(g.toDouble)
      case (g: Double, j) => jnum(j).exists(x =>
        math.abs(x - g) <= 1e-6 * math.max(1.0, math.abs(x)))
      case (g: String, JString(v)) => g == v
      case (g: scala.collection.Seq[_], JArray(a)) =>
        g.map(_.toString) == a.map(_.asInstanceOf[JString].s)
      case _ => false
    }
  }
}
