package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class GeoDistanceSpec extends SparkSpec {

  test("bbox prefilter is sound: no point inside the circle is ever cut") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    // centers spanning equator, high latitude, near-pole, near-antimeridian
    val cases = Seq(
      (0.0, 0.0, 500e3), (40.0, -75.0, 1000e3), (75.0, 10.0, 800e3),
      (88.0, 0.0, 500e3),           // circle contains the pole
      (10.0, 179.5, 300e3),         // crosses the antimeridian
      (-60.0, 120.0, 2000e3))
    cases.foreach { case (clat, clon, r) =>
      val pts = (1 to 2000).map { _ =>
        (rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      } ++ (1 to 2000).map { _ =>
        // cluster near the circle boundary where a broken box would bite
        (clat + (rnd.nextDouble() - 0.5) * 4 * math.toDegrees(r / 6371000.0),
          clon + (rnd.nextDouble() - 0.5) * 8 * math.toDegrees(r / 6371000.0))
      }.map { case (la, lo) =>
        (math.max(-90, math.min(90, la)),
          (lo + 540) % 360 - 180)
      }
      val df = pts.toDF("lat", "lon")
      val withBox = df.filter(GeoFunctions.withinDistance(
        col("lat"), col("lon"), clat, clon, r)).count()
      val pureHaversine = df.filter(GeoFunctions.haversineMeters(
        col("lat"), col("lon"), lit(clat), lit(clon)) <= lit(r)).count()
      assert(withBox === pureHaversine,
        s"box at ($clat,$clon,r=$r) cut ${pureHaversine - withBox} rows")
    }
  }

  test("polygon vertex box is sound and pushes into the scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val poly = Seq((10.0, 20.0), (14.0, 21.0), (15.5, 26.0), (11.0, 27.5),
      (9.0, 24.0))
    val pts = (1 to 4000).map { _ =>
      (8.0 + rnd.nextDouble() * 9.0, 19.0 + rnd.nextDouble() * 10.0)
    }.toDF("lat", "lon")
    def rawRaycast = {
      // the pre-fix formulation: parity fold only, no box
      val edges = poly.zip(poly.tail :+ poly.head)
      edges.indices.foldLeft(lit(false)) { (acc, i) =>
        val ((yi, xi), (yj, xj)) = edges(i)
        val straddles = (lit(yi) > col("lat")) =!= (lit(yj) > col("lat"))
        val ix = lit(xj - xi) * (col("lat") - lit(yi)) / lit(yj - yi) + lit(xi)
        acc =!= (straddles && (col("lon") < ix))
      }
    }
    assert(pts.filter(GeoFunctions.inPolygon(col("lat"), col("lon"), poly)).count() ===
      pts.filter(rawRaycast).count())

    val dir = java.nio.file.Files.createTempDirectory("geopoly").toString
    pts.write.mode("overwrite").parquet(dir)
    val q = s.read.parquet(dir)
      .filter(GeoFunctions.inPolygon(col("lat"), col("lon"), poly))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(lat"),
      scan.metadata("PushedFilters"))
  }

  test("geo_distance pushes range conjuncts into the parquet scan") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("geodist").toString
    (1 to 2000).map { i =>
      ((i * 7919 % 18000) / 100.0 - 90.0, (i * 104729 % 36000) / 100.0 - 180.0)
    }.toDF("lat", "lon").write.mode("overwrite").parquet(dir)
    val q = s.read.parquet(dir).filter(GeoFunctions.withinDistance(
      col("lat"), col("lon"), 10.0, 20.0, 300e3))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(lat") &&
      pushed.contains("LessThanOrEqual(lat") &&
      pushed.contains("GreaterThanOrEqual(lon"),
      s"bbox conjuncts must reach the reader: $pushed")
  }
}
