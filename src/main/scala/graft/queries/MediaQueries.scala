package graft.queries

import graft.Tables
import graft.media.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media url/etag resolution (db.py:624-656 DISTINCT ON) as a
  * CORRECTNESS query: media tables derived from events — urls from
  * event ids, associations from props bodies, buckets from types. */
object MediaQueries {

  def qMediaResolution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val media = ev.select(
        concat(lit("http://media.example/"), col("event_id") % 300).as("url"),
        lit("images").as("type"), lit(null).cast("string").as("owner"),
        lit("image/jpeg").as("mime"),
        lit(null).cast("timestamp").as("last_check"),
        lit(null).cast("int").as("last_status"))
      .distinct()
    val mediaObjects = ev.select(
      concat(lit("http://media.example/"), col("event_id") % 300).as("url"),
      md5(col("props")).as("etag"),
      col("ts").as("modified"))
    val objects = ev.select(
        md5(col("props")).as("etag"),
        when(col("event_type") === "click", "image/jpeg")
          .otherwise("video/mp4").as("detected_mime"))
      .groupBy(col("etag"))
      .agg(min(col("detected_mime")).as("detected_mime"))
      .withColumn("derivatives", lit(false))
      .withColumn("bucket", Media.bucketFor(col("detected_mime")))
    Media.mediaView(media, mediaObjects, objects)
      .select(col("url"), col("etag"), col("detected_mime"), col("bucket"))
      .orderBy(col("url"))
  }

  val qMediaResolutionSql: String =
    """WITH mo AS (SELECT 'http://media.example/' || (event_id % 300) AS url,
      |    md5(props) AS etag, ts AS modified FROM events),
      |latest AS (SELECT url, etag FROM (
      |  SELECT *, row_number() OVER (PARTITION BY url
      |    ORDER BY modified DESC, etag DESC) AS rn FROM mo) WHERE rn = 1),
      |objs AS (SELECT md5(props) AS etag,
      |    min(CASE WHEN event_type = 'click' THEN 'image/jpeg'
      |             ELSE 'video/mp4' END) AS detected_mime
      |  FROM events GROUP BY 1)
      |SELECT latest.url, latest.etag, objs.detected_mime,
      |  CASE objs.detected_mime WHEN 'image/jpeg' THEN 'images'
      |       WHEN 'video/mp4' THEN 'video' END AS bucket
      |FROM latest LEFT JOIN objs USING (etag)
      |ORDER BY url""".stripMargin

  /** Image-derivative generation (derivatives.py:162-193) through the
    * REAL javax.imageio resize kernel, driven end-to-end from table
    * rows via deterministic synthesized JPEGs (this environment has no
    * blob store). Binary kernels are not SQL-expressible, so this
    * query is registered WITHOUT an oracle — the driver records the
    * weaker rows-only check: 50 blobs × {thumbnail, webview} = 100
    * rows. Output carries the decoded derivative dimensions, proving
    * the full encode → resize → re-decode roundtrip: 320×240 sources
    * shrink to 260×195 thumbnails and pass through (re-encoded) for
    * the 600px webview, exactly the reference's downscale-only rule. */
  def qMediaDerivative(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ids = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id")).orderBy(col("id")).limit(50)
    val blobSchema = StructType(Seq(
      StructField("etag", StringType), StructField("content", BinaryType)))
    val blobs = s.createDataFrame(
      ids.rdd.map(r => Row(f"img${r.getLong(0)}%06d",
        Media.synthImageJpeg(r.getLong(0)))), blobSchema)
    val derivs = Media.derivatives(blobs, Media.imageResize)
    val outSchema = StructType(Seq(
      StructField("etag", StringType), StructField("kind", StringType),
      StructField("width", IntegerType), StructField("out_w", IntegerType),
      StructField("out_h", IntegerType)))
    val rows = derivs.rdd.map { r =>
      val dims = Media.imageDims(r.getAs[Array[Byte]](3)).getOrElse((-1, -1))
      Row(r.getString(0), r.getString(1), r.getInt(2), dims._1, dims._2)
    }
    s.createDataFrame(rows, outSchema).orderBy(col("etag"), col("kind"))
  }
}
