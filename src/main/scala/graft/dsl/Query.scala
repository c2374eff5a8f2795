package graft.dsl

/** The iDigBio Query Format: a JSON object `{field: predicate, ...}` with
  * implicit top-level AND.
  *
  * Shapes and semantics follow the reference translator
  * (idigbio_workers/lib/query_shim.py:181-197 and the per-predicate
  * functions at :23-161): scalar → term (strings lowercased), list →
  * terms OR, objects dispatch on "type". Unknown predicate types raise
  * [[UnknownTypeException]] (query_shim.py:154-155); the empty query is
  * match-all (query_shim.py:194-196).
  */
sealed trait Predicate {
  def field: String
}

/** Scalar values appearing in the DSL: string / number / boolean. */
sealed trait QValue
object QValue {
  final case class S(v: String)      extends QValue
  final case class N(v: BigDecimal)  extends QValue
  final case class B(v: Boolean)     extends QValue
}

final case class Term(field: String, value: QValue)         extends Predicate
final case class Terms(field: String, values: Seq[QValue])  extends Predicate
final case class Exists(field: String)                      extends Predicate
final case class Missing(field: String)                     extends Predicate
/** gt/gte/lt/lte, each optional, passed through (query_shim.py:38-50). */
final case class Range(field: String, bounds: Map[String, QValue]) extends Predicate
final case class Prefix(field: String, value: String)       extends Predicate
/** match-_all with operator AND (query_shim.py:123-133). */
final case class Fulltext(field: String, value: String)     extends Predicate
final case class GeoBoundingBox(field: String,
    topLeftLat: Double, topLeftLon: Double,
    bottomRightLat: Double, bottomRightLon: Double)          extends Predicate
final case class GeoDistance(field: String,
    distanceMeters: Double, lat: Double, lon: Double)        extends Predicate
/** points are (lat, lon) pairs (query_shim.py:89-90). */
final case class GeoPolygon(field: String,
    points: Seq[(Double, Double)])                           extends Predicate

/** GeoJSON-ish geometry for geo_shape queries. Coordinates use GeoJSON
  * (lon, lat) order, unlike the other geo predicates.
  *
  * NOTE: the reference's translator (query_shim.py:85-86) wraps the shape
  * as `typeWrapper(k, "geo_shape", {"shape": shimK})`, whose
  * `del qd["type"]` raises KeyError on the wrapped dict, which
  * `singleFilter`'s blanket except swallows — so geo_shape queries
  * silently drop the filter in the reference. We implement the intended
  * semantics instead (documented divergence).
  */
sealed trait ShapeGeom
object ShapeGeom {
  /** Outer ring, (lon, lat) GeoJSON order; closing point optional. */
  final case class Polygon(ring: Seq[(Double, Double)])               extends ShapeGeom
  /** ES envelope: [[minLon, maxLat], [maxLon, minLat]]. */
  final case class Envelope(minLon: Double, maxLat: Double,
                            maxLon: Double, minLat: Double)           extends ShapeGeom
  final case class Circle(lon: Double, lat: Double, radiusM: Double)  extends ShapeGeom
  final case class Point(lon: Double, lat: Double)                    extends ShapeGeom
}
final case class GeoShape(field: String, geom: ShapeGeom)    extends Predicate

final case class Query(predicates: Seq[Predicate])

class UnknownTypeException(msg: String) extends RuntimeException(msg)

object Query {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Parse the JSON DSL text. Implicit AND over all top-level keys
    * (query_shim.py:171-179). */
  def parse(json: String): Query = {
    JsonMethods.parse(json) match {
      case JObject(fields) => Query(fields.map { case (k, v) => predicate(k, v) })
      case JNothing        => Query(Nil)
      case other =>
        throw new UnknownTypeException(s"query root must be an object, got $other")
    }
  }

  private def qvalue(v: JValue): QValue = v match {
    case JString(s)  => QValue.S(s)
    case JInt(i)     => QValue.N(BigDecimal(i))
    case JLong(i)    => QValue.N(BigDecimal(i))
    case JDouble(d)  => QValue.N(BigDecimal(d))
    case JDecimal(d) => QValue.N(d)
    case JBool(b)    => QValue.B(b)
    case other       => throw new UnknownTypeException(s"unsupported scalar: $other")
  }

  private def num(v: JValue, what: String): Double = v match {
    case JInt(i)     => i.toDouble
    case JLong(i)    => i.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JString(s)  => s.toDouble
    case other       => throw new UnknownTypeException(s"$what must be numeric, got $other")
  }

  private def latLon(v: JValue, what: String): (Double, Double) = v match {
    case JObject(o) =>
      val m = o.toMap
      (num(m.getOrElse("lat", JNothing), s"$what.lat"),
       num(m.getOrElse("lon", JNothing), s"$what.lon"))
    case other => throw new UnknownTypeException(s"$what must be {lat, lon}, got $other")
  }

  /** ES distance-unit parse for geo_distance (e.g. "100km"); meters when
    * unitless, ES unit vocabulary subset. */
  def parseDistanceMeters(s: String): Double = {
    val t = s.trim.toLowerCase
    val (numPart, unit) = t.span(c => c.isDigit || c == '.' || c == '-')
    val v = numPart.toDouble
    unit.trim match {
      case "" | "m" | "meters" | "meter"        => v
      case "km" | "kilometers" | "kilometer"    => v * 1000.0
      case "mi" | "miles" | "mile"              => v * 1609.344
      case "nm" | "nmi" | "nauticalmiles"       => v * 1852.0
      case "yd" | "yards"                       => v * 0.9144
      case "ft" | "feet"                        => v * 0.3048
      case "cm"                                 => v / 100.0
      case "mm"                                 => v / 1000.0
      case u => throw new UnknownTypeException(s"unknown distance unit: $u")
    }
  }

  private def lonLatPair(v: JValue, what: String): (Double, Double) = v match {
    case JArray(Seq(x, y)) => (num(x, s"$what.lon"), num(y, s"$what.lat"))
    case other => throw new UnknownTypeException(s"$what must be [lon, lat], got $other")
  }

  /** GeoJSON-ish geometry parse for geo_shape (coordinates in lon,lat order). */
  private def shapeGeom(v: JValue): ShapeGeom = v match {
    case JObject(o) =>
      val m = o.toMap
      m.get("type") match {
        case Some(JString("polygon")) =>
          m.getOrElse("coordinates", JNothing) match {
            case JArray(Seq(JArray(ring), _*)) =>
              ShapeGeom.Polygon(ring.map(p => lonLatPair(p, "polygon point")))
            case other => throw new UnknownTypeException(s"polygon coordinates: $other")
          }
        case Some(JString("envelope")) =>
          m.getOrElse("coordinates", JNothing) match {
            case JArray(Seq(tl, br)) =>
              val (minLon, maxLat) = lonLatPair(tl, "envelope top_left")
              val (maxLon, minLat) = lonLatPair(br, "envelope bottom_right")
              ShapeGeom.Envelope(minLon, maxLat, maxLon, minLat)
            case other => throw new UnknownTypeException(s"envelope coordinates: $other")
          }
        case Some(JString("circle")) =>
          val (lon, lat) = lonLatPair(m.getOrElse("coordinates", JNothing), "circle center")
          val r = m.get("radius") match {
            case Some(JString(s)) => parseDistanceMeters(s)
            case Some(n)          => num(n, "circle radius")
            case None => throw new UnknownTypeException("circle needs radius")
          }
          ShapeGeom.Circle(lon, lat, r)
        case Some(JString("point")) =>
          val (lon, lat) = lonLatPair(m.getOrElse("coordinates", JNothing), "point")
          ShapeGeom.Point(lon, lat)
        case other => throw new UnknownTypeException(s"unsupported shape type: $other")
      }
    case other => throw new UnknownTypeException(s"geometry must be an object, got $other")
  }

  private def predicate(field: String, v: JValue): Predicate = v match {
    // scalar → term (query_shim.py:93-105; lowercasing happens at compile)
    case JString(_) | JInt(_) | JLong(_) | JDouble(_) | JDecimal(_) | JBool(_) =>
      Term(field, qvalue(v))
    // list → terms OR (query_shim.py:108-121)
    case JArray(items) => Terms(field, items.map(qvalue))
    case JObject(o) =>
      val m = o.toMap
      m.get("type") match {
        case Some(JString("exists"))  => Exists(field)
        case Some(JString("missing")) => Missing(field)
        case Some(JString("range")) =>
          val bounds = m.collect {
            case (k @ ("gt" | "gte" | "lt" | "lte"), bv) => k -> qvalue(bv)
          }
          if (bounds.isEmpty)
            throw new UnknownTypeException(s"range on $field has no bounds")
          Range(field, bounds)
        case Some(JString("prefix")) =>
          m.get("value") match {
            case Some(JString(s)) => Prefix(field, s)
            case other => throw new UnknownTypeException(s"prefix value: $other")
          }
        case Some(JString("fulltext")) =>
          m.get("value") match {
            case Some(JString(s)) => Fulltext(field, s)
            case other => throw new UnknownTypeException(s"fulltext value: $other")
          }
        case Some(JString("geo_bounding_box")) =>
          val (tlLat, tlLon) = latLon(m.getOrElse("top_left", JNothing), "top_left")
          val (brLat, brLon) = latLon(m.getOrElse("bottom_right", JNothing), "bottom_right")
          GeoBoundingBox(field, tlLat, tlLon, brLat, brLon)
        case Some(JString("geo_distance")) =>
          val dist = m.get("distance") match {
            case Some(JString(s)) => parseDistanceMeters(s)
            case other => throw new UnknownTypeException(s"geo_distance distance: $other")
          }
          GeoDistance(field, dist,
            num(m.getOrElse("lat", JNothing), "lat"),
            num(m.getOrElse("lon", JNothing), "lon"))
        case Some(JString("geo_polygon")) =>
          val pts = m.getOrElse("points", JNothing) match {
            case JArray(items) => items.map(p => latLon(p, "point"))
            case other => throw new UnknownTypeException(s"geo_polygon points: $other")
          }
          GeoPolygon(field, pts)
        case Some(JString("geo_shape")) =>
          val geomJson = m.get("geometry").orElse(m.get("shape")).getOrElse(
            throw new UnknownTypeException(s"geo_shape on $field needs geometry"))
          GeoShape(field, shapeGeom(geomJson))
        case Some(JString(t)) => throw new UnknownTypeException(s"unknown predicate type: $t")
        case _ => throw new UnknownTypeException(s"predicate on $field has no type")
      }
    case other => throw new UnknownTypeException(s"unsupported predicate shape: $other")
  }
}
