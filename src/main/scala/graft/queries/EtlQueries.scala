package graft.queries

import graft.Tables
import graft.etl.{Enrich, FieldSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The grabAll enrichment pipeline (SURVEY §2.8) as a CORRECTNESS query:
  * raw `dwc:*` records are synthesized deterministically from `orders`
  * (string building via integer concat only, so both engines see
  * byte-identical inputs), pushed through the real
  * [[graft.etl.Enrich.records]] pipeline, and compared against a DuckDB
  * mirror of the SQL-expressible semantics: number grabbing with
  * thousands separators, date parsing + day-of-year, geo parse + flag
  * set, basisOfRecord vocabulary fixing, crossfill, flag folding, and
  * the data-quality score.
  */
object EtlQueries {

  def qEnrich(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val latStr = concat(
      (col("o_orderkey") % 170 - 85).cast("string"), lit("."),
      lpad((col("o_orderkey") % 1000).cast("string"), 3, "0"))
    val lonStr = concat(
      (col("o_orderkey") % 340 - 170).cast("string"), lit("."),
      lpad((col("o_custkey") % 1000).cast("string"), 3, "0"))
    val elevStr = concat((col("o_orderkey") % 5000).cast("string"), lit(".5 m"))
    val countStr = concat((col("o_custkey") % 9 + 1).cast("string"), lit(","),
      lpad((col("o_orderkey") % 1000).cast("string"), 3, "0"))
    val sciname = concat(lit("Genus"), (col("o_custkey") % 50).cast("string"),
      lit(" epithet"), (col("o_orderkey") % 100).cast("string"))
    val borStr = when(col("o_orderpriority") === "1-URGENT", "Preserved Specimen")
      .when(col("o_orderpriority") === "2-HIGH", "Fossil bones")
      .when(col("o_orderpriority") === "3-MEDIUM", "machine observation")
      .when(col("o_orderpriority") === "4-NOT SPECIFIED", "mystery meat")
      .otherwise("unknown sheet")
    // Sort at the SOURCE, not on the enriched result: a top-level orderBy
    // range-samples its child, which re-executes the entire enrich
    // projection a second time just to pick partition boundaries. Sorting
    // the scan first means the sampling job reads only the pruned orders
    // columns, and the enrich projection (order-preserving, narrow) runs
    // once, in parallel, over already-ranged partitions.
    val raw = o.orderBy(col("o_orderkey")).select(
      col("o_orderkey").as("id"),
      map(
        lit("dwc:scientificName"), sciname,
        lit("dwc:eventDate"), col("o_orderdate").cast("string"),
        lit("dwc:decimalLatitude"), latStr,
        lit("dwc:decimalLongitude"), lonStr,
        lit("dwc:minimumElevationInMeters"), elevStr,
        lit("dwc:individualCount"), countStr,
        lit("dwc:basisOfRecord"), borStr,
      ).as("data"))
    Enrich.records(raw).select(
      col("id"),
      col("scientificname"), col("genus"), col("specificepithet"),
      col("basisofrecord"),
      col("minelevation"), col("individualcount"),
      col("geopoint.lat").as("lat"), col("geopoint.lon").as("lon"),
      col("datecollected"), col("startdayofyear"), col("eventdate"),
      array_join(col("flags"), ",").as("flags"),
      col("dqs"),
    )
  }

  val qEnrichSql: String = {
    val maxScore = FieldSchema.maxScores("records")
    s"""WITH raw AS (
       |  SELECT o_orderkey AS id,
       |    lower('Genus' || CAST(o_custkey % 50 AS VARCHAR) ||
       |          ' epithet' || CAST(o_orderkey % 100 AS VARCHAR)) AS sciname,
       |    CAST(o_orderdate AS VARCHAR) AS event_str,
       |    o_orderdate,
       |    CAST(CAST(o_orderkey % 170 - 85 AS VARCHAR) || '.' ||
       |         lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') AS DOUBLE) AS lat,
       |    CAST(CAST(o_orderkey % 340 - 170 AS VARCHAR) || '.' ||
       |         lpad(CAST(o_custkey % 1000 AS VARCHAR), 3, '0') AS DOUBLE) AS lon,
       |    (o_orderkey % 5000) + 0.5 AS minelevation,
       |    CAST((o_custkey % 9 + 1) * 1000 + (o_orderkey % 1000) AS DOUBLE)
       |      AS individualcount,
       |    CASE o_orderpriority
       |      WHEN '1-URGENT' THEN 'preservedspecimen'
       |      WHEN '2-HIGH' THEN 'fossilspecimen'
       |      WHEN '3-MEDIUM' THEN 'machineobservation'
       |      ELSE NULL END AS bor_fixed
       |  FROM orders)
       |SELECT id, sciname AS scientificname,
       |  string_split(sciname, ' ')[1] AS genus,
       |  string_split(sciname, ' ')[2] AS specificepithet,
       |  bor_fixed AS basisofrecord,
       |  minelevation, individualcount, lat, lon,
       |  CAST(o_orderdate AS TIMESTAMP) AS datecollected,
       |  CAST(dayofyear(o_orderdate) AS INT) AS startdayofyear,
       |  event_str AS eventdate,
       |  concat_ws(',',
       |    CASE WHEN lat = 0 OR lon = 0 THEN 'geopoint_0_coord' END,
       |    CASE WHEN abs(lat) = abs(lon) THEN 'geopoint_similar_coord' END,
       |    'geopoint_datum_missing',
       |    'genus_added', 'specificepithet_added',
       |    CASE WHEN bor_fixed IS NULL THEN 'dwc_basisofrecord_removed' END,
       |    CASE WHEN bor_fixed IS NULL THEN 'dwc_basisofrecord_invalid' END
       |  ) AS flags,
       |  ((CASE WHEN bor_fixed IS NULL THEN 10 ELSE 11 END)
       |   - (3 + (CASE WHEN lat = 0 OR lon = 0 THEN 1 ELSE 0 END)
       |        + (CASE WHEN abs(lat) = abs(lon) THEN 1 ELSE 0 END)
       |        + (CASE WHEN bor_fixed IS NULL THEN 2 ELSE 0 END)))
       |  / $maxScore AS dqs
       |FROM raw ORDER BY id""".stripMargin
  }
}
