package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Abridged-Molodensky datum shifts (Datums; conversions.py:485-509 is
  * the behavior being stood in for). Magnitude checks use the well-known
  * shift scales: NAD27→WGS84 in CONUS moves a point tens of meters
  * (≈ a few 1e-4 degrees); WGS72→WGS84 moves it a few meters. */
class DatumsSpec extends SparkSpec {
  import spark.implicits._

  private def shifted(datum: String, lon: Double, lat: Double): (Double, Double) = {
    val df = Seq((lon, lat, datum)).toDF("_glon", "_glat", "_datum_norm")
      .select(
        expr(Datums.lonCaseSql("_glon", "_glat", "_datum_norm")).as("lon"),
        expr(Datums.latCaseSql("_glon", "_glat", "_datum_norm")).as("lat"))
    val r = df.collect().head
    (r.getDouble(0), r.getDouble(1))
  }

  test("WGS84 and unknown datums are identity") {
    assert(shifted("WGS84", -98.5, 39.8) == ((-98.5, 39.8)))
    assert(shifted("MARS2000", -98.5, 39.8) == ((-98.5, 39.8)))
    assert(shifted("NAD83", -98.5, 39.8) == ((-98.5, 39.8)))
  }

  test("NAD27 CONUS shift is tens of meters, in the published direction") {
    // Kansas: NAD27→WGS84 moves points tens of meters; 1e-4 deg ≈ 10 m
    val (lon, lat) = shifted("NAD27", -98.5, 39.8)
    val dLon = lon - (-98.5); val dLat = lat - 39.8
    assert(math.abs(dLon) > 1e-5 && math.abs(dLon) < 2e-3, s"dLon=$dLon")
    assert(math.abs(dLat) > 1e-6 && math.abs(dLat) < 2e-3, s"dLat=$dLat")
  }

  test("ED50 western-Europe shift is roughly -100m class") {
    val (lon, lat) = shifted("ED50", 5.0, 52.0)
    assert(math.abs(lon - 5.0) > 1e-5 && math.abs(lon - 5.0) < 3e-3)
    assert(math.abs(lat - 52.0) > 1e-5 && math.abs(lat - 52.0) < 3e-3)
  }

  test("WGS72 shift is meters-scale (dz=4.5 dominates)") {
    val (lon, lat) = shifted("WGS72", 10.0, 45.0)
    assert(math.abs(lat - 45.0) < 1e-4 && math.abs(lat - 45.0) > 1e-8)
    // dx=dy=0 ⇒ longitude unchanged
    assert(lon == 10.0)
  }

  test("shift composes through Enrich.records before rev-geocode order") {
    val raw = Seq(1L).toDF("id").select(col("id"), map(
      lit("dwc:decimalLatitude"), lit("39.800000"),
      lit("dwc:decimalLongitude"), lit("-98.500000"),
      lit("dwc:geodeticDatum"), lit("North American Datum 1927")).as("data"))
    val r = Enrich.records(raw)
      .select(col("geopoint.lon"), col("geopoint.lat")).collect().head
    assert(r.getDouble(0) != -98.5 && r.getDouble(1) != 39.8)
  }

  test("Column form (constant-lookup, one formula) matches the CASE SQL spec") {
    // every shifted datum plus passthrough cases, at several points incl.
    // the equator/antimeridian corners — the lookup-constant formula must
    // reproduce the per-datum CASE expansion to double precision
    val points = Seq((-98.5, 39.8), (10.0, 45.0), (139.7, 35.7),
      (151.2, -33.9), (-47.9, -15.8), (0.001, 0.001), (179.9, 60.0))
    val datums = Datums.shiftedDatums ++ Seq("WGS84", "MARS2000")
    val rows = for { d <- datums; (lo, la) <- points } yield (lo, la, d)
    val df = rows.toDF("_glon", "_glat", "_datum_norm")
      .select(
        expr(Datums.lonCaseSql("_glon", "_glat", "_datum_norm")).as("lon_sql"),
        expr(Datums.latCaseSql("_glon", "_glat", "_datum_norm")).as("lat_sql"),
        Datums.lonCol(col("_glon"), col("_glat"), col("_datum_norm")).as("lon_col"),
        Datums.latCol(col("_glon"), col("_glat"), col("_datum_norm")).as("lat_col"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12, r)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12, r)
    }
  }
}
