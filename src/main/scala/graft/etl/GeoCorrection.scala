package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reverse geocoding + coordinate-correction flip search
  * (idb/helpers/rg.py:14-78 and conversions.py:514-563) — the one
  * enrichment stage that needs external data (country polygons).
  *
  * Design mirrors the reference at cluster scale: a 1° lat/lon grid
  * prefilter over country polygons, broadcast to executors, probed by
  * an even-odd point-in-polygon test. The polygon set is injectable
  * ([[CountryIndex]]); shapefile loading is environment-specific and
  * out of scope — tests use fixture rectangles, production supplies the
  * parsed world-borders set.
  */
object GeoCorrection {

  /** One country polygon: ISO code + outer ring as (lon, lat) pairs. */
  final case class CountryShape(code: String, ring: Seq[(Double, Double)])

  /** Broadcast-able grid index (rg.py:21-40: lat_box/lon_box sets with
    * prepared geometries — here a cell → candidate-shapes map). */
  final class CountryIndex(shapes: Seq[CountryShape]) extends Serializable {
    private val byCell: Map[(Int, Int), Seq[CountryShape]] = {
      val cells = for {
        s <- shapes
        lons = s.ring.map(_._1); lats = s.ring.map(_._2)
        x <- math.floor(lons.min).toInt to math.floor(lons.max).toInt
        y <- math.floor(lats.min).toInt to math.floor(lats.max).toInt
      } yield (x, y) -> s
      cells.groupBy(_._1).map { case (c, ss) => c -> ss.map(_._2) }
    }

    private def contains(ring: Seq[(Double, Double)], lon: Double, lat: Double): Boolean = {
      // even-odd ray cast, same rule as GeoFunctions.inPolygon
      var inside = false
      var i = 0
      val n = ring.size
      while (i < n) {
        val (xi, yi) = ring(i)
        val (xj, yj) = ring((i + 1) % n)
        if (((yi > lat) != (yj > lat)) &&
            (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
        i += 1
      }
      inside
    }

    /** rg.py:42-50 get_country. */
    def countryOf(lon: Double, lat: Double): Option[String] = {
      if (lat < -90 || lat > 90 || lon < -180 || lon > 180) return None
      byCell.getOrElse((math.floor(lon).toInt, math.floor(lat).toInt), Nil)
        .collectFirst { case s if contains(s.ring, lon, lat) => s.code }
    }
  }

  /** The 7-way flip-search candidate list (conversions.py:531-547):
    * sign flips always; transposes only when |lon| <= 90. Returns
    * (lon, lat, flagName) in the reference's priority order. */
  def flipCandidates(lon: Double, lat: Double): Seq[(Double, Double, String)] = {
    val base = Seq(
      (-lon, lat, "rev_geocode_lon_sign"),
      (lon, -lat, "rev_geocode_lat_sign"),
      (-lon, -lat, "rev_geocode_both_sign"))
    if (math.abs(lon) <= 90.0) base ++ Seq(
      (lat, lon, "rev_geocode_flip"),
      (-lat, lon, "rev_geocode_flip_lat_sign"),
      (lat, -lon, "rev_geocode_flip_lon_sign"),
      (-lat, -lon, "rev_geocode_flip_both_sign"))
    else base
  }

  /** Pure per-point correction (conversions.py:514-563): reverse
    * geocode, EEZ fallback, country-mismatch detection, flip search.
    * Returns the (possibly corrected) point and the flag list. */
  def correctPoint(index: CountryIndex, eez: Option[CountryIndex],
      lon: Double, lat: Double, isoCountryCode: Option[String])
      : ((Double, Double), Seq[String]) = {
    var flags = Vector.empty[String]
    var result = index.countryOf(lon, lat)
    if (result.isEmpty) {
      val fromEez = eez.flatMap(_.countryOf(lon, lat))
      if (fromEez.isDefined) { result = fromEez; flags :+= "rev_geocode_eez" }
    }
    val mismatch = isoCountryCode.exists(cc =>
      result.exists(_.toLowerCase != cc.toLowerCase))
    val testFlips = result.isEmpty || mismatch
    if (result.isEmpty) flags :+= "rev_geocode_failure"
    if (mismatch) flags :+= "rev_geocode_mismatch"

    if (testFlips && isoCountryCode.isDefined) {
      if (!flags.contains("rev_geocode_mismatch")) flags :+= "rev_geocode_mismatch"
      val cc = isoCountryCode.get.toLowerCase
      val cands = flipCandidates(lon, lat)
      // primary pass over land, second pass over EEZ (conversions.py:548-549)
      val passes = Seq((index, false)) ++ eez.map(e => (e, true)).toSeq
      val hit = passes.view.flatMap { case (idx, isEez) =>
        cands.view.flatMap { case (flon, flat, flag) =>
          idx.countryOf(flon, flat) match {
            case Some(c) if c.toLowerCase == cc => Some((flon, flat, flag, isEez))
            case _ => None
          }
        }.headOption
      }.headOption
      hit match {
        case Some((flon, flat, flag, isEez)) =>
          flags :+= flag
          if (isEez) flags :+= "rev_geocode_eez_corrected"
          flags :+= "rev_geocode_corrected"
          return ((flon, flat), flags)
        case None => ()
      }
    }
    ((lon, lat), flags)
  }

  /** Pipeline stage form: applies [[correctPoint]] to the `geopoint`
    * struct + `countrycode` column via a UDF over the broadcast index
    * (SURVEY §2.11 explicitly budgets this cluster as a broadcast-lookup
    * UDF — polygon probing is not expressible in codegen built-ins).
    * Rewrites `geopoint` with the corrected point and adds a
    * `_rg_flags: array<string>` column (null when there is no geopoint)
    * for the caller's flag fold — used by [[Enrich.records]] so the
    * rev_geocode_* flags land in fold order and count toward dqs. */
  def stage(df: DataFrame, index: CountryIndex,
      eez: Option[CountryIndex] = None): DataFrame = {
    val spark = df.sparkSession
    val bIdx = spark.sparkContext.broadcast(index)
    val bEez = spark.sparkContext.broadcast(eez)
    val fn = udf { (lon: Option[Double], lat: Option[Double], cc: Option[String]) =>
      (lon, lat) match {
        case (Some(lo), Some(la)) =>
          val ((nlon, nlat), flags) = correctPoint(
            bIdx.value, bEez.value, lo, la, cc)
          Some((nlon, nlat, flags))
        case _ => Option.empty[(Double, Double, Seq[String])]
      }
    }
    val cc = if (df.columns.contains("countrycode")) col("countrycode")
             else lit(null).cast("string")
    df.withColumn("_rg", fn(col("geopoint.lon"), col("geopoint.lat"), cc))
      .withColumn("geopoint",
        when(col("_rg").isNotNull,
          struct(col("_rg._1").as("lon"), col("_rg._2").as("lat")))
          .otherwise(col("geopoint")))
      .withColumn("_rg_flags", col("_rg._3"))
      .drop("_rg")
  }

  /** Standalone form: corrects `geopoint` and concatenates the
    * rev_geocode flags onto an existing `flags` array. */
  def reverseGeocode(df: DataFrame, index: CountryIndex,
      eez: Option[CountryIndex] = None): DataFrame =
    stage(df, index, eez)
      .withColumn("flags",
        when(col("_rg_flags").isNotNull, concat(col("flags"), col("_rg_flags")))
          .otherwise(col("flags")))
      .drop("_rg_flags")
}
