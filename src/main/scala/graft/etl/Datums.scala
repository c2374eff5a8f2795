package graft.etl

import org.apache.spark.sql.Column

/** Datum → WGS84 reprojection via the abridged Molodensky transformation
  * (public DMA TR-8350.2 formulas with the published 3-parameter
  * geocentric shifts), standing in for the reference's PROJ transform
  * (conversions.py:485-509: Transformer.from_crs(src, EPSG:4326)).
  *
  * A 3-parameter shift reproduces PROJ's grid-less fallback to within a
  * few meters for these datums — the right fidelity/complexity point for
  * an engine without a projection library. NAD83/GRS80/ETRS89/GDA94 are
  * within ~1-2 m of WGS84 (PROJ's grid-less path treats them as
  * identity) so they pass through unshifted, as do unknown datums
  * (matching the reference, whose failed CRS construction leaves the
  * point untouched under `flag_geopoint_datum_error`,
  * conversions.py:496-509).
  *
  * The formulas are generated as SQL TEXT consumed twice: Spark-side via
  * `expr(...)` and oracle-side verbatim in DuckDB — one source of truth,
  * identical parse trees, identical IEEE-double evaluation order. (The
  * engines' sin/cos may differ in the last ulp; queries comparing output
  * round to 7 decimals ≈ 1 cm.)
  */
object Datums {

  /** Source ellipsoid (semi-major axis a, inverse flattening 1/f) and
    * geocentric shift (dx, dy, dz meters) to WGS84. Published values:
    * Clarke 1866 / International 1924 / Airy 1830 / WGS72 ellipsoids,
    * DMA TR-8350.2 datum shift tables. */
  final case class Shift(a: Double, invF: Double,
      dx: Double, dy: Double, dz: Double)

  val Wgs84A = 6378137.0
  val Wgs84InvF = 298.257223563

  val shifts: Map[String, Shift] = Map(
    // NAD27 (Clarke 1866), CONUS mean shift
    "NAD27" -> Shift(6378206.4, 294.9786982, -8.0, 160.0, 176.0),
    // ED50 (International 1924), western-Europe mean
    "ED50" -> Shift(6378388.0, 297.0, -87.0, -98.0, -121.0),
    // OSGB36 (Airy 1830), Great Britain mean
    "OSGB36" -> Shift(6377563.396, 299.3249646, 375.0, -111.0, 431.0),
    // WGS72 → WGS84 (z-shift dominates; Δa/Δf carry the rest)
    "WGS72" -> Shift(6378135.0, 298.26, 0.0, 0.0, 4.5),
    // Tokyo (Bessel 1841), Japan mean
    "TOKYO" -> Shift(6377397.155, 299.1528128, -148.0, 507.0, 685.0),
    // AGD66 / AGD84 (Australian National ellipsoid), Australia mean
    "AGD66" -> Shift(6378160.0, 298.25, -133.0, -48.0, 148.0),
    "AGD84" -> Shift(6378160.0, 298.25, -134.0, -48.0, 149.0),
    // SAD69 (GRS 1967 modified), South-America mean
    "SAD69" -> Shift(6378160.0, 298.247167427, -57.0, 1.0, -41.0),
  )

  /** Datum codes that get an actual coordinate shift. */
  val shiftedDatums: Seq[String] = shifts.keys.toSeq.sorted

  /** (lonSql, latSql): abridged Molodensky for one datum over column
    * references `lon`/`lat` (degrees). Δφ and Δλ in radians:
    *   Δφ = (-dx sinφ cosλ - dy sinφ sinλ + dz cosφ + (a·Δf + f·Δa) sin2φ) / Rm
    *   Δλ = (-dx sinλ + dy cosλ) / (Rn cosφ)
    * with W = √(1 - e²sin²φ), Rm = a(1-e²)/W³, Rn = a/W, e² = 2f - f². */
  private def branch(lon: String, lat: String, s: Shift): (String, String) = {
    val f = 1.0 / s.invF
    val e2 = 2.0 * f - f * f
    val da = Wgs84A - s.a
    val df = 1.0 / Wgs84InvF - f
    val k = s.a * df + f * da          // (a·Δf + f·Δa)
    val aRm = s.a * (1.0 - e2)         // Rm numerator
    val sp = s"sin(radians($lat))"
    val cp = s"cos(radians($lat))"
    val sl = s"sin(radians($lon))"
    val cl = s"cos(radians($lon))"
    val w = s"sqrt(1.0 - ($e2) * $sp * $sp)"
    val dphi = s"(((${-s.dx}) * $sp * $cl + (${-s.dy}) * $sp * $sl + " +
      s"(${s.dz}) * $cp + ($k) * sin(2.0 * radians($lat))) * $w * $w * $w / ($aRm))"
    val dlam = s"(((${-s.dx}) * $sl + (${s.dy}) * $cl) * $w / ((${s.a}) * $cp))"
    (s"($lon + degrees($dlam))", s"($lat + degrees($dphi))")
  }

  private def caseSql(lon: String, lat: String, datum: String,
      pick: ((String, String)) => String, fallback: String): String = {
    val whens = shiftedDatums.map { d =>
      s"WHEN '$d' THEN ${pick(branch(lon, lat, shifts(d)))}"
    }.mkString(" ")
    s"(CASE $datum $whens ELSE $fallback END)"
  }

  /** WGS84 longitude as a SQL expression over `lon`,`lat`,`datum`
    * columns — unshifted datums fall through to the input. Consumed by
    * the DuckDB oracle (and kept as the executable spec of the Column
    * form below, which DatumsSpec pins against it). */
  def lonCaseSql(lon: String, lat: String, datum: String): String =
    caseSql(lon, lat, datum, _._1, lon)

  /** WGS84 latitude; see [[lonCaseSql]]. */
  def latCaseSql(lon: String, lat: String, datum: String): String =
    caseSql(lon, lat, datum, _._2, lat)

  // --- Column form: constants-by-lookup, ONE formula --------------------
  // The CASE SQL above instantiates the full Molodensky expression once
  // per datum (8 × ~3 KB of generated code). Here the per-datum constants
  // come from native hash probes (graft.functions.StaticLookup) and the
  // formula is emitted once — same math, an order of magnitude less
  // bytecode, and the engines no longer share one generated source (the
  // oracle CASE is now an independent restatement of this arithmetic).

  private def constCol(datum: Column, name: String, f: Shift => Double): Column =
    graft.functions.StaticLookup.double(datum, s"datum_$name",
      shifts.map { case (k, s) => k -> f(s) })

  /** (Δλ°, Δφ°) columns of the abridged-Molodensky shift for `datum`
    * (null for unshifted datums — callers guard with isin anyway). */
  private def deltas(lon: Column, lat: Column, datum: Column): (Column, Column) = {
    import org.apache.spark.sql.functions._
    val aC = constCol(datum, "a", _.a)
    val e2C = constCol(datum, "e2", { s =>
      val f = 1.0 / s.invF; 2.0 * f - f * f })
    val kC = constCol(datum, "k", { s =>
      val f = 1.0 / s.invF
      s.a * (1.0 / Wgs84InvF - f) + f * (Wgs84A - s.a) })
    val aRmC = constCol(datum, "arm", { s =>
      val f = 1.0 / s.invF; s.a * (1.0 - (2.0 * f - f * f)) })
    val dxC = constCol(datum, "dx", _.dx)
    val dyC = constCol(datum, "dy", _.dy)
    val dzC = constCol(datum, "dz", _.dz)
    val sp = sin(radians(lat)); val cp = cos(radians(lat))
    val sl = sin(radians(lon)); val cl = cos(radians(lon))
    val w = sqrt(lit(1.0) - e2C * sp * sp)
    val dphi = ((dxC * lit(-1.0)) * sp * cl + (dyC * lit(-1.0)) * sp * sl +
      dzC * cp + kC * sin(lit(2.0) * radians(lat))) * w * w * w / aRmC
    val dlam = ((dxC * lit(-1.0)) * sl + dyC * cl) * w / (aC * cp)
    (degrees(dlam), degrees(dphi))
  }

  /** WGS84 longitude Column; input passthrough for unshifted datums. */
  def lonCol(lon: Column, lat: Column, datum: Column): Column = {
    import org.apache.spark.sql.functions._
    coalesce(lon + deltas(lon, lat, datum)._1, lon)
  }

  /** WGS84 latitude Column; see [[lonCol]]. */
  def latCol(lon: Column, lat: Column, datum: Column): Column = {
    import org.apache.spark.sql.functions._
    coalesce(lat + deltas(lon, lat, datum)._2, lat)
  }
}
