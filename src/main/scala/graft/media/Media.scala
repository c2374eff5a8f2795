package graft.media

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Media / multimodal-column layer (SURVEY §2.1 media rows, db.py
  * :804-827, idigbio_ingestion/mediaing/): media URLs, fetched blobs as
  * `binary` columns with typed metadata, and derivative generation.
  *
  * The container has no imaging or HTTP libraries, so the FETCH and
  * DECODE kernels are injectable functions with deterministic fakes —
  * the Spark-side plumbing (schemas, prefix partitioning, mapPartitions
  * batch shape, status-table MERGE inputs) is real and tested, and a
  * production deployment swaps the kernel only.
  */
object Media {

  /** media / objects / media_objects table schemas (db.py:804-827). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("type", StringType),
    StructField("owner", StringType), StructField("mime", StringType),
    StructField("last_check", TimestampType),
    StructField("last_status", IntegerType)))

  val objectsSchema: StructType = StructType(Seq(
    StructField("etag", StringType), StructField("detected_mime", StringType),
    StructField("derivatives", BooleanType), StructField("bucket", StringType)))

  val mediaObjectsSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("etag", StringType),
    StructField("modified", TimestampType)))

  /** DISTINCT ON (url) … ORDER BY modified DESC (db.py:624-656): latest
    * object association per url — `max_by` aggregation + joins, the
    * same single-pass shape as the store's latest-version view. */
  def mediaView(media: DataFrame, mediaObjects: DataFrame,
      objects: DataFrame): DataFrame = {
    val latestAssoc = mediaObjects
      .groupBy(col("url"))
      .agg(max(struct(col("modified"), col("etag"))).as("top"))
      .select(col("url"), col("top.etag").as("etag"),
        col("top.modified").as("assoc_modified"))
    media
      .join(latestAssoc, Seq("url"), "left")
      .join(objects, Seq("etag"), "left")
  }

  /** URL prefix for per-host fetch grouping (fetcher.py:183-201 groups
    * by prefix so one slow host never starves the rest). */
  def urlPrefix(url: Column): Column =
    regexp_extract(url, "^(https?://[^/]+)", 1)

  /** The fetched-blob row produced by [[fetchBatch]]. */
  val fetchResultSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("status", IntegerType),
    StructField("etag", StringType),          // md5 of the blob, like calcFileHash
    StructField("detected_mime", StringType),
    StructField("content", BinaryType)))

  /** Fetch pending media: repartition by host prefix (each partition =
    * one host's queue, executed by one task — the reference's
    * per-prefix subprocess, without the subprocesses), then
    * mapPartitions over the injectable fetch kernel.
    *
    * The default kernel is a deterministic fake: content bytes derived
    * from the url's md5, status 200. */
  def fetchBatch(pending: DataFrame,
      fetcher: String => (Int, Array[Byte], String) = fakeFetcher)
      : DataFrame = {
    val spark = pending.sparkSession
    val urlIdx = pending.schema.fieldIndex("url")
    val rows = pending
      .repartition(urlPrefix(col("url")))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val url = r.getString(urlIdx)
          val (status, bytes, mime) = fetcher(url)
          val md = java.security.MessageDigest.getInstance("MD5")
          val etag = md.digest(bytes).map(b => f"$b%02x").mkString
          Row(url, status, etag, mime, bytes)
        }
      }
    spark.createDataFrame(rows, fetchResultSchema)
  }

  /** Deterministic fake fetch kernel (no network in this container). */
  def fakeFetcher(url: String): (Int, Array[Byte], String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val seed = md.digest(url.getBytes("UTF-8"))
    // 1 KiB of deterministic bytes
    val content = Array.tabulate[Byte](1024)(i => (seed(i % 16) + i).toByte)
    val mime = if (url.endsWith(".jpg")) "image/jpeg" else "application/octet-stream"
    (200, content, mime)
  }

  /** Derivative widths (derivatives.py:24-27). */
  val Widths: Map[String, Int] = Map("thumbnail" -> 260, "webview" -> 600)

  /** One derivative row per (etag, kind). */
  val derivativeSchema: StructType = StructType(Seq(
    StructField("etag", StringType),
    StructField("deriv", StringType),
    StructField("width", IntegerType),
    StructField("content", BinaryType)))

  /** Generate thumbnail/webview derivatives for fetched blobs via an
    * injectable resize kernel (derivatives.py:162-193, 293-305). The
    * fake kernel "resizes" by hashing the source bytes with the target
    * width — deterministic, size-bounded, schema-correct. */
  def derivatives(blobs: DataFrame,
      resize: (Array[Byte], Int) => Array[Byte] = fakeResize): DataFrame = {
    val spark = blobs.sparkSession
    val etagIdx = blobs.schema.fieldIndex("etag")
    val contentIdx = blobs.schema.fieldIndex("content")
    val kinds = Widths.toSeq.sortBy(_._1)
    val rows = blobs.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val etag = r.getString(etagIdx)
        val content = r.getAs[Array[Byte]](contentIdx)
        kinds.map { case (kind, w) =>
          Row(etag, kind, w, resize(content, w))
        }
      }
    }
    spark.createDataFrame(rows, derivativeSchema)
  }

  def fakeResize(bytes: Array[Byte], width: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes)
    md.update(width.toString.getBytes("UTF-8"))
    md.digest()
  }

  /** mime → storage bucket with validation flag (media_validation.py).*/
  def bucketFor(mime: Column): Column =
    graft.etl.Vocab.defaultBuckets.foldLeft(when(lit(false), lit("")))(
      (acc, kv) => acc.when(mime === kv._1, kv._2))
}
