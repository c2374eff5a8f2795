package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Final search-table serialization (prepForEs,
  * idb/indexing/indexer.py:50-89) and WKT geoshape parsing
  * (conversions.py:771-816).
  */
object Serialize {

  /** prepForEs: timestamps → ISO-8601 strings, geopoint exposed as the
    * `{lon, lat}` object shape. Null-dropping is moot in a columnar
    * store (nulls simply aren't written). */
  def prepForEs(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampType =>
          date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ssXXX").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** generate_geoshape_from_wkt (conversions.py:771-816): parse
    * `POLYGON((lon lat, lon lat, ...))` — or the degenerate bare
    * comma-separated coordinate list some providers send — into a
    * geoshape struct; unparseable input flags `geoshape_invalid_wkt`.
    * Returns (geoshape struct with (type, coordinates), invalidFlag). */
  def geoshapeFromWkt(wkt: Column): (Column, Column) = {
    val inner = regexp_extract(upper(trim(wkt)),
      "^POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)$", 1)
    val polyPairs = transform(split(inner, "\\s*,\\s*"), p => {
      val xy = split(trim(p), "\\s+")
      // try_element_at: a malformed coord pair ("10" with no y) must
      // yield a null that polyOk rejects, not an ANSI OOB error
      struct(try_element_at(xy, lit(1))
          .try_cast(org.apache.spark.sql.types.DoubleType).as("lon"),
        try_element_at(xy, lit(2))
          .try_cast(org.apache.spark.sql.types.DoubleType).as("lat"))
    })
    // bare list fallback: "x,y,x,y,..." with an even count (:777-782)
    val nums = split(trim(wkt), "\\s*,\\s*")
    val bareOk = wkt.isNotNull && inner === "" &&
      size(nums) >= 4 && size(nums) % 2 === 0 &&
      !exists(nums, n => n.try_cast(org.apache.spark.sql.types.DoubleType).isNull)
    val barePairs = transform(sequence(lit(0), (size(nums) / 2).cast("int") - 1), i =>
      struct(try_element_at(nums, (i * 2 + 1).cast("int"))
          .try_cast(org.apache.spark.sql.types.DoubleType).as("lon"),
        try_element_at(nums, (i * 2 + 2).cast("int"))
          .try_cast(org.apache.spark.sql.types.DoubleType).as("lat")))
    val polyOk = inner =!= "" &&
      !exists(polyPairs, p => p.getField("lon").isNull || p.getField("lat").isNull)
    val shape = when(polyOk,
        struct(lit("polygon").as("type"), polyPairs.as("coordinates")))
      .when(bareOk,
        struct(lit("polygon").as("type"), barePairs.as("coordinates")))
    val invalid = wkt.isNotNull && shape.isNull
    (shape, invalid)
  }

  /** Point-radius fallback (conversions.py:793-801): circle from the
    * geopoint and coordinateuncertainty when no WKT shape parsed. */
  def geoshapeFromPointRadius(geopoint: Column, uncertainty: Column): Column =
    when(geopoint.isNotNull && uncertainty.isNotNull,
      struct(lit("circle").as("type"),
        array(geopoint).as("coordinates"),
        uncertainty.cast("string").as("radius")))
}
