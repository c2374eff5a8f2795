package graft.dsl

import graft.functions.GeoFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler: iDigBio Query Format predicate AST → Catalyst `Column`.
  *
  * Semantics follow the reference translator
  * (idigbio_workers/lib/query_shim.py) and the write-side normalization
  * (idb/helpers/conversions.py:280-285, which lowercases every string at
  * extract time so ES term queries are exact matches):
  *
  *  - term/terms/prefix/fulltext lowercase string query values
  *    (query_shim.py:97, :112, :57, :128);
  *  - implicit AND over all top-level keys (query_shim.py:171-179);
  *  - the empty query is match-all (query_shim.py:194-196).
  *
  * Everything compiles to codegen'd built-in expressions — no UDFs — so
  * filters stay inside WholeStageCodegen and, when
  * [[Options.dataNormalized]] is set, push down to the parquet scan.
  */
object Compile {

  /** @param dataNormalized string columns were already lowercased at write
    *   time (the reference's regime). Term/prefix filters then compile to
    *   plain `col === lit` / `startswith`, which Spark pushes down to the
    *   parquet reader (`PushedFilters: [EqualTo(...)]`) — essential at
    *   100 TB. When false (querying raw data) we wrap the column in
    *   `lower(...)`, which is correct but scan-only.
    * @param fulltextColumn column holding the concatenated search text;
    *   the reference's fulltext predicate matches ES `_all`, ignoring the
    *   query key (query_shim.py:123-133). None = use the predicate's own
    *   field.
    * @param geoFields query field → (lat column, lon column). Fields not
    *   present compile against `field.lat` / `field.lon` (a geopoint
    *   struct column).
    */
  final case class Options(
      dataNormalized: Boolean = false,
      fulltextColumn: Option[String] = None,
      geoFields: Map[String, (String, String)] = Map.empty)

  /** Whole-query compile: AND-fold of all predicates; empty = match-all. */
  def query(q: Query, opts: Options = Options()): Column =
    q.predicates match {
      case Nil => lit(true)
      case ps  => ps.map(predicate(_, opts)).reduce(_ && _)
    }

  /** Parse + compile in one step. */
  def fromJson(json: String, opts: Options = Options()): Column =
    query(Query.parse(json), opts)

  /** `_source` projection with dotted-path fields
    * (download.py:155-163 get_source_value, :320-323): "a.b.c" walks
    * nested structs; the last path segment names the output column. */
  def projection(fields: Seq[String]): Seq[Column] =
    fields.map { f =>
      val c = f.split("\\.").foldLeft(Option.empty[Column]) {
        case (None, seg)      => Some(col(seg))
        case (Some(acc), seg) => Some(acc.getField(seg))
      }.get
      c.as(f.split("\\.").last)
    }

  private def strEq(c: Column, v: String, opts: Options): Column =
    if (opts.dataNormalized) c === lit(v.toLowerCase)
    else lower(c) === lit(v.toLowerCase)

  private def valueEq(field: String, v: QValue, opts: Options): Column = v match {
    case QValue.S(s) => strEq(col(field), s, opts)
    case QValue.N(n) => col(field) === lit(n.toDouble)
    case QValue.B(b) => col(field) === lit(b)
  }

  private def rangeLit(v: QValue): Column = v match {
    // range values pass through untouched in the reference
    // (query_shim.py:49-50); strings coerce against the column type.
    case QValue.S(s) => lit(s)
    case QValue.N(n) => lit(n.toDouble)
    case QValue.B(b) => lit(b)
  }

  private def geoCols(field: String, opts: Options): (Column, Column) =
    opts.geoFields.get(field) match {
      case Some((la, lo)) => (col(la), col(lo))
      case None           => (col(s"$field.lat"), col(s"$field.lon"))
    }

  def predicate(p: Predicate, opts: Options = Options()): Column = p match {
    case Term(f, v)   => valueEq(f, v, opts)
    case Terms(f, vs) =>
      // OR-list (query_shim.py:108-121). Strings lowercase; keep isin when
      // homogeneous so Catalyst can turn it into an In / InSet pushdown.
      val anyString = vs.exists(_.isInstanceOf[QValue.S])
      if (anyString && !opts.dataNormalized)
        vs.map(valueEq(f, _, opts)).reduce(_ || _)
      else {
        val lits = vs.map {
          case QValue.S(s) => s.toLowerCase: Any
          case QValue.N(n) => n.toDouble: Any
          case QValue.B(b) => b: Any
        }
        col(f).isin(lits: _*)
      }
    case Exists(f)  => col(f).isNotNull
    case Missing(f) => col(f).isNull
    case Range(f, bounds) =>
      bounds.map {
        case ("gt", v)  => col(f) >  rangeLit(v)
        case ("gte", v) => col(f) >= rangeLit(v)
        case ("lt", v)  => col(f) <  rangeLit(v)
        case ("lte", v) => col(f) <= rangeLit(v)
        case (k, _)     => throw new UnknownTypeException(s"range bound $k")
      }.reduce(_ && _)
    case Prefix(f, v) =>
      if (opts.dataNormalized) col(f).startsWith(v.toLowerCase)
      else lower(col(f)).startsWith(v.toLowerCase)
    case Fulltext(f, v) =>
      // match-_all operator AND (query_shim.py:123-133): every token of
      // the (lowercased) query must appear as a token of the search text.
      val target = opts.fulltextColumn.getOrElse(f)
      val toks = v.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val words = split(lower(col(target)), "\\s+")
      toks.map(t => array_contains(words, t)) match {
        case Array() => lit(true)
        case cs      => cs.reduce(_ && _)
      }
    case GeoBoundingBox(f, tlLat, tlLon, brLat, brLon) =>
      val (la, lo) = geoCols(f, opts)
      GeoFunctions.inBoundingBox(la, lo, tlLat, tlLon, brLat, brLon)
    case GeoDistance(f, meters, lat, lon) =>
      val (la, lo) = geoCols(f, opts)
      GeoFunctions.withinDistance(la, lo, lat, lon, meters)
    case GeoPolygon(f, points) =>
      val (la, lo) = geoCols(f, opts)
      GeoFunctions.inPolygon(la, lo, points)
    case GeoShape(f, geom) =>
      val (la, lo) = geoCols(f, opts)
      geom match {
        case ShapeGeom.Polygon(ring) =>
          // GeoJSON (lon, lat) → inPolygon's (lat, lon); drop the closing
          // point if the ring is explicitly closed.
          val pts = ring.map { case (x, y) => (y, x) }
          val open = if (pts.size > 3 && pts.head == pts.last) pts.init else pts
          GeoFunctions.inPolygon(la, lo, open)
        case ShapeGeom.Envelope(minLon, maxLat, maxLon, minLat) =>
          GeoFunctions.inBoundingBox(la, lo, maxLat, minLon, minLat, maxLon)
        case ShapeGeom.Circle(lon, lat, r) =>
          GeoFunctions.withinDistance(la, lo, lat, lon, r)
        case ShapeGeom.Point(lon, lat) =>
          la === lit(lat) && lo === lit(lon)
      }
  }
}
