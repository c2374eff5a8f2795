package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-record differential audit of the enrich pipeline against the
  * REFERENCE's own grabAll: tools/gen_enrich_differential.py runs
  * idb/helpers/conversions.py:932-964 (sandbox stubs as in
  * calibrate_enrich.py) over structured-random records and records the
  * normalized outputs; this main replays the same records through
  * [[graft.etl.Enrich.records]] / [[graft.etl.Enrich.mediarecords]]
  * and prints field-level mismatches. Stub asymmetries (datum
  * reprojection, gnparser reverse crossfill, reverse geocoding) are
  * excluded at generation time.
  *
  * Usage: runMain graft.EnrichDifferential <vectors.jsonl> [records|mediarecords]
  */
object EnrichDifferential {
  import org.json4s._

  private def jnum(v: JValue): Option[Double] = v match {
    case JDouble(d) => Some(d)
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  private def agree(got: Any, exp: JValue): Boolean = (got, exp) match {
    case (null, JNull) => true
    case (null, _) | (_, JNull) => false
    case (g: Long, j) => jnum(j).contains(g.toDouble)
    case (g: Int, j) => jnum(j).contains(g.toDouble)
    case (g: Double, j) =>
      jnum(j).exists(x => math.abs(x - g) <= 1e-6 * math.max(1.0, math.abs(x)))
    case (g: String, JString(s)) => g == s
    case (g: scala.collection.Seq[_], JArray(a)) =>
      g.map(_.toString) == a.map(_.asInstanceOf[JString].s)
    case _ => false
  }

  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/enrichdiff/vectors.jsonl"
    val kind = if (args.length > 1) args(1) else "records"
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.json4s.jackson.JsonMethods

    val parsed = scala.io.Source.fromFile(path).getLines().toSeq
      .map(JsonMethods.parse(_))
    implicit val fmts: Formats = DefaultFormats
    val inputs = parsed.map { j =>
      ((j \ "id").extract[Long], (j \ "data").extract[Map[String, String]])
    }
    val exps = parsed.map(j => ((j \ "id").extract[Long], j \ "exp")).toMap
    val df = inputs.toDF("id", "data")

    var bad = 0
    var checked = 0
    def cmp(id: Long, field: String, got: Any, exp: JValue): Unit = {
      checked += 1
      if (!agree(got, exp)) {
        bad += 1
        if (bad <= 40)
          println(s"[diff] id=$id $field engine=${Option(got).getOrElse("null")} " +
            s"ref=${JsonMethods.compact(JsonMethods.render(exp))}")
      }
    }

    val nRecords =
      if (kind == "recordsets" || kind == "publishers") {
        val fields =
          if (kind == "recordsets")
            Seq("datemodified", "uuid", "version", "rights", "archivelink",
              "emllink", "logourl", "name", "flags", "dqs")
          else Seq("datemodified", "uuid", "version", "name", "flags", "dqs")
        val enriched =
          if (kind == "recordsets") graft.etl.Enrich.recordsets(df)
          else graft.etl.Enrich.publishers(df)
        val out = enriched.select(Seq(col("id"),
          unix_micros(col("datemodified")).as("datemodified")) ++
          fields.drop(1).dropRight(2).map(col) ++ Seq(
            array_sort(col("flags")).as("flags"),
            round(col("dqs"), 6).as("dqs")): _*).collect()
        out.foreach { r =>
          val id = r.getLong(0)
          fields.zipWithIndex.foreach { case (f, i) =>
            cmp(id, f, if (r.isNullAt(i + 1)) null else r.get(i + 1),
              exps(id) \ f)
          }
        }
        out.length
      } else if (kind == "mediarecords") {
        val fields = Seq("modified", "type", "tag", "format", "mediatype",
          "accessuri", "xpixels", "ypixels", "flags", "dqs")
        val out = graft.etl.Enrich.mediarecords(df).select(
          col("id"),
          unix_micros(col("modified")).as("modified"),
          col("type"), col("tag"), col("format"), col("mediatype"),
          col("accessuri"), col("xpixels"), col("ypixels"),
          array_sort(col("flags")).as("flags"),
          round(col("dqs"), 6).as("dqs")).collect()
        out.foreach { r =>
          val id = r.getLong(0)
          fields.zipWithIndex.foreach { case (f, i) =>
            cmp(id, f, if (r.isNullAt(i + 1)) null else r.get(i + 1),
              exps(id) \ f)
          }
        }
        out.length
      } else {
        val fields = Seq("datecollected", "startdayofyear", "eventdate",
          "minelevation", "maxelevation", "mindepth", "maxdepth",
          "individualcount", "coordinateuncertainty", "basisofrecord",
          "taxonrank", "scientificname", "genus", "specificepithet",
          "commonnames", "associatedsequences")
        val out = graft.etl.Enrich.records(df).select(
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
          col("geopoint.lon").as("g_lon"), col("geopoint.lat").as("g_lat"),
          array_sort(filter(col("flags"),
            f => !f.startsWith("rev_geocode"))).as("flags"),
          round(col("dqs"), 6).as("dqs")).collect()
        out.foreach { r =>
          val id = r.getLong(0)
          val e = exps(id)
          fields.zipWithIndex.foreach { case (f, i) =>
            cmp(id, f, if (r.isNullAt(i + 1)) null else r.get(i + 1), e \ f)
          }
          def g(i: Int): Any = if (r.isNullAt(i)) null else r.get(i)
          e \ "geopoint" match {
            case JArray(List(lon, lat)) =>
              cmp(id, "geopoint.lon", g(17), lon)
              cmp(id, "geopoint.lat", g(18), lat)
            case _ =>
              cmp(id, "geopoint.lon", g(17), JNull)
              cmp(id, "geopoint.lat", g(18), JNull)
          }
          cmp(id, "flags", g(19), e \ "flags")
          cmp(id, "dqs", g(20), e \ "dqs")
        }
        out.length
      }
    println(s"[enrichdiff] ${checked - bad}/$checked field comparisons agree " +
      s"($bad mismatches, $nRecords $kind)")
    spark.stop()
  }
}
