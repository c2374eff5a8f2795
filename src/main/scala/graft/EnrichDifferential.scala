package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-record differential audit of the enrich pipeline against the
  * REFERENCE's own grabAll: tools/gen_enrich_differential.py runs
  * idb/helpers/conversions.py:932-964 (sandbox stubs as in
  * calibrate_enrich.py) over structured-random records and records the
  * normalized outputs; this main replays the same records through
  * [[graft.etl.Enrich.records]] and prints field-level mismatches.
  * Stub asymmetries (datum reprojection, gnparser reverse crossfill,
  * reverse geocoding) are excluded at generation time. */
object EnrichDifferential {
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/enrichdiff/vectors.jsonl"
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods

    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    val parsed = lines.map(JsonMethods.parse(_))
    implicit val fmts: Formats = DefaultFormats
    val inputs = parsed.map { j =>
      ((j \ "id").extract[Long],
        (j \ "data").extract[Map[String, String]])
    }
    val exps = parsed.map { j =>
      ((j \ "id").extract[Long], (j \ "exp").asInstanceOf[JObject])
    }.toMap

    val df = inputs.toDF("id", "data")
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
      round(col("dqs"), 6).as("dqs"))
      .collect()

    var bad = 0
    var checked = 0
    def jnum(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    out.foreach { r =>
      val id = r.getLong(0)
      val e = exps(id)
      def expV(k: String): JValue = e \ k
      def cmp(field: String, got: Any, exp: JValue): Unit = {
        checked += 1
        val ok = (got, exp) match {
          case (null, JNull) => true
          case (null, _) => false
          case (_, JNull) => false
          case (g: Long, j) => jnum(j).contains(g.toDouble)
          case (g: Int, j) => jnum(j).contains(g.toDouble)
          case (g: Double, j) =>
            jnum(j).exists(x => math.abs(x - g) <= 1e-6 * math.max(1.0, math.abs(x)))
          case (g: String, JString(s)) => g == s
          case (g: scala.collection.Seq[_], JArray(a)) =>
            g.map(_.toString) == a.map(_.asInstanceOf[JString].s)
          case _ => false
        }
        if (!ok) {
          bad += 1
          if (bad <= 40)
            println(s"[diff] id=$id $field engine=${Option(got).getOrElse("null")} ref=${JsonMethods.compact(JsonMethods.render(exp))}")
        }
      }
      def g(i: Int): Any = if (r.isNullAt(i)) null else r.get(i)
      cmp("datecollected", g(1), expV("datecollected"))
      cmp("startdayofyear", g(2), expV("startdayofyear"))
      cmp("eventdate", g(3), expV("eventdate"))
      cmp("minelevation", g(4), expV("minelevation"))
      cmp("maxelevation", g(5), expV("maxelevation"))
      cmp("mindepth", g(6), expV("mindepth"))
      cmp("maxdepth", g(7), expV("maxdepth"))
      cmp("individualcount", g(8), expV("individualcount"))
      cmp("coordinateuncertainty", g(9), expV("coordinateuncertainty"))
      cmp("basisofrecord", g(10), expV("basisofrecord"))
      cmp("taxonrank", g(11), expV("taxonrank"))
      cmp("scientificname", g(12), expV("scientificname"))
      cmp("genus", g(13), expV("genus"))
      cmp("specificepithet", g(14), expV("specificepithet"))
      cmp("commonnames", g(15), expV("commonnames"))
      cmp("associatedsequences", g(16), expV("associatedsequences"))
      val gp = expV("geopoint")
      gp match {
        case JArray(List(lon, lat)) =>
          cmp("geopoint.lon", g(17), lon)
          cmp("geopoint.lat", g(18), lat)
        case _ =>
          cmp("geopoint.lon", g(17), JNull)
          cmp("geopoint.lat", g(18), JNull)
      }
      cmp("flags", g(19), expV("flags"))
      cmp("dqs", g(20), expV("dqs"))
    }
    println(s"[enrichdiff] ${checked - bad}/$checked field comparisons agree ($bad mismatches, ${out.length} records)")
    spark.stop()
  }
}
