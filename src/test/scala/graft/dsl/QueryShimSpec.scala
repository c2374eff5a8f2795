package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden tests for the Query Format parser + compiler, ported from the
  * reference's shim suite (tests/idb/test_helpers_query_shim.py) — same
  * inputs, semantics asserted against compiled-filter results instead of
  * ES JSON.
  */
class QueryShimSpec extends SparkSpec {

  // --- parser shapes (test_helpers_query_shim.py:112-197) --------------

  test("scalar string parses to Term, value raw until compile") {
    assert(Query.parse("""{"genus": "Acer"}""") ===
      Query(Seq(Term("genus", QValue.S("Acer")))))
  }

  test("bool/number scalars parse to Term with native type") {
    assert(Query.parse("""{"hasImage": true}""") ===
      Query(Seq(Term("hasImage", QValue.B(true)))))
    assert(Query.parse("""{"version": 3}""") ===
      Query(Seq(Term("version", QValue.N(BigDecimal(3))))))
  }

  test("list parses to Terms OR (query_shim.py:108-121)") {
    assert(Query.parse("""{"genus": ["Acer", "Quercus"]}""") ===
      Query(Seq(Terms("genus", Seq(QValue.S("Acer"), QValue.S("Quercus"))))))
  }

  test("exists / missing (query_shim.py:23-36)") {
    assert(Query.parse("""{"scientificname": {"type": "exists"}}""") ===
      Query(Seq(Exists("scientificname"))))
    assert(Query.parse("""{"scientificname": {"type": "missing"}}""") ===
      Query(Seq(Missing("scientificname"))))
  }

  test("range keeps gt/gte/lt/lte bounds (test_helpers_query_shim.py:56-66)") {
    val q = Query.parse(
      """{"minelevation": {"type": "range", "gte": "100", "lte": "200"}}""")
    assert(q === Query(Seq(Range("minelevation",
      Map("gte" -> QValue.S("100"), "lte" -> QValue.S("200"))))))
  }

  test("prefix (test_helpers_query_shim.py:69-78)") {
    assert(Query.parse("""{"family": {"type": "prefix", "value": "aster"}}""") ===
      Query(Seq(Prefix("family", "aster"))))
  }

  test("geo_bounding_box (test_helpers_query_shim.py:81-98)") {
    val q = Query.parse(
      """{"geopoint": {"type": "geo_bounding_box",
        |  "top_left": {"lat": 19.23, "lon": -130},
        |  "bottom_right": {"lat": -45.1119, "lon": 179.99999}}}""".stripMargin)
    assert(q === Query(Seq(
      GeoBoundingBox("geopoint", 19.23, -130, -45.1119, 179.99999))))
  }

  test("geo_distance parses distance units (test_helpers_query_shim.py:101-110)") {
    val q = Query.parse(
      """{"geopoint": {"type": "geo_distance", "distance": "100km",
        |  "lat": -46.3445, "lon": 110.454}}""".stripMargin)
    assert(q === Query(Seq(
      GeoDistance("geopoint", 100000.0, -46.3445, 110.454))))
  }

  test("distance unit vocabulary") {
    assert(Query.parseDistanceMeters("100km") === 100000.0)
    assert(Query.parseDistanceMeters("1mi") === 1609.344)
    assert(Query.parseDistanceMeters("500") === 500.0)
    assert(Query.parseDistanceMeters("3nmi") === 5556.0)
    intercept[UnknownTypeException](Query.parseDistanceMeters("10parsec"))
  }

  test("geo_polygon points are (lat, lon) (query_shim.py:89-90)") {
    val q = Query.parse(
      """{"geopoint": {"type": "geo_polygon", "points": [
        |  {"lat": 0, "lon": 0}, {"lat": 10, "lon": 0}, {"lat": 0, "lon": 10}]}}""".stripMargin)
    assert(q === Query(Seq(GeoPolygon("geopoint",
      Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))))))
  }

  test("geo_shape geometries parse (intended semantics; reference drops them)") {
    val q = Query.parse(
      """{"geopoint": {"type": "geo_shape", "geometry": {
        |  "type": "envelope", "coordinates": [[-10, 10], [10, -10]]}}}""".stripMargin)
    assert(q === Query(Seq(
      GeoShape("geopoint", ShapeGeom.Envelope(-10, 10, 10, -10)))))
  }

  test("unknown predicate type raises (query_shim.py:154-155)") {
    intercept[UnknownTypeException](
      Query.parse("""{"genus": {"type": "frobnicate"}}"""))
  }

  test("empty query is match-all (query_shim.py:194-196)") {
    assert(Query.parse("{}") === Query(Nil))
  }

  test("implicit AND over all top-level keys (query_shim.py:171-179)") {
    val q = Query.parse("""{"genus": "acer", "stateprovince": "florida"}""")
    assert(q.predicates.size === 2)
  }

  // --- compiled behavior on data ---------------------------------------

  private lazy val records = {
    val s = spark
    import s.implicits._
    Seq(
      (1, "acer", "florida", "preservedspecimen", 25.7, -80.2, "red maple tree"),
      (2, "acer", "georgia", "fossilspecimen", 33.7, -84.4, "sugar maple"),
      (3, "quercus", "florida", "preservedspecimen", 27.9, -82.5, "live oak tree"),
      (4, null, "florida", "humanobservation", 30.4, -84.3, "unknown plant"),
    ).toDF("id", "genus", "stateprovince", "basisofrecord", "lat", "lon", "notes")
  }

  private def ids(json: String, opts: Compile.Options = Compile.Options()): Seq[Int] =
    records.filter(Compile.fromJson(json, opts))
      .select("id").collect().map(_.getInt(0)).toSeq.sorted

  test("reference smoke query: genus+stateprovince term AND (download.py:588-594)") {
    assert(ids("""{"genus": "Acer", "stateprovince": "FLORIDA"}""") === Seq(1))
  }

  test("term matches case-insensitively via lowercase normalization") {
    assert(ids("""{"genus": "ACER"}""") === Seq(1, 2))
  }

  test("terms OR-list") {
    assert(ids("""{"genus": ["Acer", "Quercus"]}""") === Seq(1, 2, 3))
  }

  test("exists / missing behavior") {
    assert(ids("""{"genus": {"type": "exists"}}""") === Seq(1, 2, 3))
    assert(ids("""{"genus": {"type": "missing"}}""") === Seq(4))
  }

  test("range over numbers") {
    assert(ids("""{"lat": {"type": "range", "gte": 27, "lt": 31}}""") === Seq(3, 4))
  }

  test("range with string bounds coerces (query passthrough)") {
    assert(ids("""{"lat": {"type": "range", "gte": "27", "lt": "31"}}""") === Seq(3, 4))
  }

  test("prefix lowercases the value") {
    assert(ids("""{"basisofrecord": {"type": "prefix", "value": "PRESERVED"}}""")
      === Seq(1, 3))
  }

  test("fulltext is all-tokens-must-match AND") {
    assert(ids("""{"notes": {"type": "fulltext", "value": "maple"}}""") === Seq(1, 2))
    assert(ids("""{"notes": {"type": "fulltext", "value": "MAPLE tree"}}""") === Seq(1))
    assert(ids("""{"notes": {"type": "fulltext", "value": "tree shrub"}}""") === Seq())
  }

  test("fulltext can target a dedicated search column (ES _all analog)") {
    val opts = Compile.Options(fulltextColumn = Some("notes"))
    assert(ids("""{"data": {"type": "fulltext", "value": "oak"}}""", opts) === Seq(3))
  }

  test("empty query compiles to match-all") {
    assert(ids("{}") === Seq(1, 2, 3, 4))
  }

  private val geoOpts = Compile.Options(geoFields = Map("geopoint" -> ("lat", "lon")))

  test("geo_distance: within 200km of Miami catches Miami only") {
    assert(ids(
      """{"geopoint": {"type": "geo_distance", "distance": "200km",
        |  "lat": 25.77, "lon": -80.19}}""".stripMargin, geoOpts) === Seq(1))
  }

  test("geo_bounding_box over Florida") {
    assert(ids(
      """{"geopoint": {"type": "geo_bounding_box",
        |  "top_left": {"lat": 31.0, "lon": -88.0},
        |  "bottom_right": {"lat": 24.0, "lon": -79.0}}}""".stripMargin, geoOpts)
      === Seq(1, 3, 4))
  }

  test("geo_polygon triangle") {
    // base lat 24 from lon -90..-76, apex (34, -83): contains 1, 3, 4
    assert(ids(
      """{"geopoint": {"type": "geo_polygon", "points": [
        |  {"lat": 24.0, "lon": -90.0}, {"lat": 24.0, "lon": -76.0},
        |  {"lat": 34.0, "lon": -83.0}]}}""".stripMargin, geoOpts) === Seq(1, 3, 4))
  }

  test("geo_shape envelope == bounding box") {
    assert(ids(
      """{"geopoint": {"type": "geo_shape", "geometry": {
        |  "type": "envelope", "coordinates": [[-88.0, 31.0], [-79.0, 24.0]]}}}""".stripMargin,
      geoOpts) === Seq(1, 3, 4))
  }

  test("geo_shape polygon takes GeoJSON lon,lat order and closed rings") {
    assert(ids(
      """{"geopoint": {"type": "geo_shape", "geometry": {
        |  "type": "polygon", "coordinates": [[[-90.0, 24.0], [-76.0, 24.0],
        |  [-83.0, 34.0], [-90.0, 24.0]]]}}}""".stripMargin, geoOpts) === Seq(1, 3, 4))
  }

  test("normalized-data mode compiles to pushdown-friendly equality") {
    val s = spark
    import s.implicits._
    val normalized = Seq((1, "acer"), (2, "quercus")).toDF("id", "genus")
    val c = Compile.fromJson("""{"genus": "Acer"}""",
      Compile.Options(dataNormalized = true))
    assert(normalized.filter(c).select("id").collect().map(_.getInt(0)).toSeq === Seq(1))
    // plan contains a plain equality on the attribute, no lower() wrapper
    val plan = normalized.filter(c).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("lower("))
  }
}
