package graft.etl

import graft.SparkSpec
import graft.etl.GeoCorrection.{CountryIndex, CountryShape}
import org.apache.spark.sql.functions._

/** Flip-search semantics vs the reference (conversions.py:514-563) on
  * fixture rectangle "countries". */
class GeoCorrectionSpec extends SparkSpec {

  // two rectangular countries: usa in the NW quadrant, aus in the SE
  private val usa = CountryShape("usa",
    Seq((-130.0, 25.0), (-60.0, 25.0), (-60.0, 50.0), (-130.0, 50.0)))
  private val aus = CountryShape("aus",
    Seq((110.0, -45.0), (155.0, -45.0), (155.0, -10.0), (110.0, -10.0)))
  private val idx = new CountryIndex(Seq(usa, aus))
  // an EEZ extension of usa, reaching further south
  private val eezIdx = new CountryIndex(Seq(
    CountryShape("usa", Seq((-130.0, 10.0), (-60.0, 10.0), (-60.0, 25.0), (-130.0, 25.0)))))

  test("grid index resolves containing country, None outside") {
    assert(idx.countryOf(-100.0, 40.0) === Some("usa"))
    assert(idx.countryOf(140.0, -30.0) === Some("aus"))
    assert(idx.countryOf(0.0, 0.0) === None)
    assert(idx.countryOf(200.0, 0.0) === None) // out of bounds
  }

  test("match with declared country: no flags, point unchanged") {
    val ((lon, lat), flags) =
      GeoCorrection.correctPoint(idx, None, -100.0, 40.0, Some("usa"))
    assert((lon, lat) === (-100.0, 40.0))
    assert(flags === Seq())
  }

  test("eez fallback flags rev_geocode_eez (conversions.py:516-519)") {
    val ((_, _), flags) =
      GeoCorrection.correctPoint(idx, Some(eezIdx), -100.0, 20.0, Some("usa"))
    assert(flags === Seq("rev_geocode_eez"))
  }

  test("lat-sign flip correction (conversions.py:531-547)") {
    // aus point recorded with flipped latitude sign: (140, +30)
    val ((lon, lat), flags) =
      GeoCorrection.correctPoint(idx, None, 140.0, 30.0, Some("aus"))
    assert((lon, lat) === (140.0, -30.0))
    assert(flags.contains("rev_geocode_failure"))
    assert(flags.contains("rev_geocode_mismatch"))
    assert(flags.contains("rev_geocode_lat_sign"))
    assert(flags.contains("rev_geocode_corrected"))
  }

  test("transpose flip correction when |lon| <= 90") {
    // usa point entered as (lat, lon) = (40, -100) → stored lon=40, lat=-100?
    // bounds would reject lat -100; use (30, -80): transposed (-80, 30) is usa
    val ((lon, lat), flags) =
      GeoCorrection.correctPoint(idx, None, 30.0, -80.0, Some("usa"))
    assert((lon, lat) === (-80.0, 30.0))
    assert(flags.contains("rev_geocode_flip"))
  }

  test("mismatch with no recoverable flip keeps point, flags mismatch") {
    val ((lon, lat), flags) =
      GeoCorrection.correctPoint(idx, None, -100.0, 40.0, Some("aus"))
    assert((lon, lat) === (-100.0, 40.0))
    assert(flags.contains("rev_geocode_mismatch"))
    assert(!flags.contains("rev_geocode_corrected"))
  }

  test("DataFrame stage corrects points and appends flags") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Some(-100.0), Some(40.0), "usa"),
      (2, Some(140.0), Some(30.0), "aus"),
      (3, Option.empty[Double], Option.empty[Double], "usa"),
    ).toDF("id", "lon", "lat", "countrycode")
      .withColumn("geopoint",
        when(col("lon").isNotNull, struct(col("lon"), col("lat"))))
      .withColumn("flags", array().cast("array<string>"))
      .drop("lon", "lat")
    val out = GeoCorrection.reverseGeocode(df, idx).orderBy("id").collect()
    assert(out(0).getStruct(out(0).fieldIndex("geopoint")).getDouble(1) === 40.0)
    assert(out(0).getSeq[String](out(0).fieldIndex("flags")) === Seq())
    val gp2 = out(1).getStruct(out(1).fieldIndex("geopoint"))
    assert((gp2.getDouble(0), gp2.getDouble(1)) === (140.0, -30.0))
    assert(out(1).getSeq[String](out(1).fieldIndex("flags"))
      .contains("rev_geocode_lat_sign"))
    assert(out(2).isNullAt(out(2).fieldIndex("geopoint")))
  }
}
