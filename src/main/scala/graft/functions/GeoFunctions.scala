package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo predicates composed entirely from codegen'd built-ins — no UDFs in
  * the hot path, so they stay inside WholeStageCodegen and push work to
  * executors unchanged at any scale.
  *
  * Semantics follow the reference's Elasticsearch geo filters
  * (idigbio_workers/lib/query_shim.py:68-90).
  */
object GeoFunctions {
  private val EarthRadiusMeters = 6371008.8 // IUGG mean Earth radius

  /** Great-circle distance in meters (haversine). */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** geo_distance: within `meters` of (lat, lon).
    *
    * The haversine predicate alone is invisible to every pruning
    * layer (trig over columns: no parquet min/max pushdown, no
    * [[graft.plans.GeohashPruning]] bounds). So the exact circle test
    * is CONJOINED with its sound bounding box (Matuschek, "Finding
    * Points Within a Distance of a Latitude/Longitude"): lat extent
    * is exactly ±ρ (ρ = angular radius), lon extent exactly
    * ±asin(sin ρ / cos φ₀) when the circle holds no pole — plain
    * `BETWEEN` conjuncts the parquet reader pushes into row-group
    * stats and the geohash rule turns into partition pruning, while
    * haversine keeps the row-level answer identical (the box is
    * implied by the circle, so no row ever changes — the DSL oracle
    * hash-checks exactly that). Pole-touching circles and antimeridian
    * crossings skip the affected bound (still sound). */
  def withinDistance(latCol: Column, lonCol: Column,
      lat: Double, lon: Double, meters: Double): Column = {
    val eps = 1e-9 // absorb double rounding between box and haversine
    val rho = meters / EarthRadiusMeters
    val rhoDeg = math.toDegrees(rho)
    val latLo = lat - rhoDeg - eps
    val latHi = lat + rhoDeg + eps
    val latBand: Column =
      latCol >= lit(math.max(-90.0, latLo)) &&
        latCol <= lit(math.min(90.0, latHi))
    val lonBand: Column =
      if (latLo <= -90.0 + eps || latHi >= 90.0 - eps) lit(true)
      else {
        val dLon = math.toDegrees(
          math.asin(math.sin(rho) / math.cos(math.toRadians(lat)))) + eps
        if (lon - dLon < -180.0 || lon + dLon > 180.0) lit(true)
        else lonCol >= lit(lon - dLon) && lonCol <= lit(lon + dLon)
      }
    latBand && lonBand &&
      (haversineMeters(latCol, lonCol, lit(lat), lit(lon)) <= lit(meters))
  }

  /** geo_bounding_box, including the date-line wrap ES handles (west > east
    * means the box crosses the antimeridian). */
  def inBoundingBox(latCol: Column, lonCol: Column,
      topLeftLat: Double, topLeftLon: Double,
      bottomRightLat: Double, bottomRightLon: Double): Column = {
    val latOk = latCol <= lit(topLeftLat) && latCol >= lit(bottomRightLat)
    val lonOk =
      if (topLeftLon <= bottomRightLon)
        lonCol >= lit(topLeftLon) && lonCol <= lit(bottomRightLon)
      else // crosses the antimeridian
        lonCol >= lit(topLeftLon) || lonCol <= lit(bottomRightLon)
    latOk && lonOk
  }

  /** geo_polygon via even-odd ray casting, unrolled per edge at plan time.
    * The polygon is a per-query constant, so N edges become N codegen'd
    * boolean terms XOR-folded into a parity bit — distributed, no UDF,
    * no broadcast needed. Points are (lat, lon). */
  def inPolygon(latCol: Column, lonCol: Column, points: Seq[(Double, Double)]): Column = {
    require(points.size >= 3, "polygon needs >= 3 points")
    val edges = points.zip(points.tail :+ points.head)
    val crossings = edges.map { case ((yi, xi), (yj, xj)) =>
      // edge straddles the ray's latitude AND intersection is east of the point
      val straddles = (lit(yi) > latCol) =!= (lit(yj) > latCol)
      val intersectLon =
        lit(xj - xi) * (latCol - lit(yi)) / lit(yj - yi) + lit(xi)
      straddles && (lonCol < intersectLon)
    }
    val raycast =
      edges.indices.foldLeft(lit(false)) { (acc, i) => acc =!= crossings(i) }
    // sound vertex bounding box, conjoined for the same reason as
    // withinDistance's: the parity test is trig-free but still opaque
    // to min/max pruning; plain range conjuncts reach the reader and
    // the geohash rule. Any ray-cast-true point lies within the vertex
    // box (odd crossings are impossible outside it), so no row changes.
    val eps = 1e-12
    val lats = points.map(_._1); val lons = points.map(_._2)
    (latCol >= lit(lats.min - eps)) && (latCol <= lit(lats.max + eps)) &&
      (lonCol >= lit(lons.min - eps)) && (lonCol <= lit(lons.max + eps)) &&
      raycast
  }

  /** The ray-cast predicate as ANSI SQL over `latExpr`/`lonExpr` — used to
    * generate DuckDB oracle SQL that matches [[inPolygon]] bit-for-bit. */
  def inPolygonSql(latExpr: String, lonExpr: String,
      points: Seq[(Double, Double)]): String = {
    val edges = points.zip(points.tail :+ points.head)
    // XOR-fold expressed as crossing-count parity (DuckDB cannot parse a
    // chained `a != b != c` of booleans).
    edges.map { case ((yi, xi), (yj, xj)) =>
      s"CAST(((($yi > $latExpr) != ($yj > $latExpr)) AND " +
        s"($lonExpr < ${xj - xi} * ($latExpr - $yi) / ${yj - yi} + $xi)) AS INT)"
    }.mkString("((", " + ", ") % 2 = 1)")
  }

  /** Haversine distance in meters as ANSI SQL (oracle twin of
    * [[withinDistance]]). */
  def haversineSql(latExpr: String, lonExpr: String, lat: Double, lon: Double): String =
    s"2 * $EarthRadiusMeters * asin(sqrt(" +
      s"pow(sin(radians($latExpr - ($lat)) / 2), 2) + " +
      s"cos(radians($lat)) * cos(radians($latExpr)) * " +
      s"pow(sin(radians($lonExpr - ($lon)) / 2), 2)))"
}
