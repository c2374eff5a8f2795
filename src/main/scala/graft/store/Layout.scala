package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for the record store at scale (SURVEY §1.1's
  * "parquet bucketed by uuid" claim, made executable).
  *
  * The store's hot joins — version log ⋈ registry, identifiers ⋈
  * registry, bodies ⋈ latest — all key on `uuid`/`etag`. At 100 TB the
  * dominant cost of every one of them is the shuffle that co-locates
  * the keys; Spark's bucketing removes it: two tables written with the
  * same bucket count and key join with ZERO Exchange (and, when also
  * `sortBy`-ed, reduced Sort work) because the scan itself reports the
  * required hash partitioning. Bucket counts must match — pick one per
  * key domain and keep it (buckets here are the analog of the
  * reference's Postgres uuid b-tree locality).
  *
  * LayoutSpec proves the plan shape: a join of two tables written by
  * [[writeBucketed]] contains no ShuffleExchange.
  */
object Layout {

  /** Write `df` as a bucketed (+ optionally sorted) parquet table at an
    * explicit path. `saveAsTable` is required — bucketing metadata
    * lives in the catalog, plain `.parquet(path)` writes would lose it. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String, sorted: Boolean = true): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = df.write.format("parquet").option("path", path)
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).mode("overwrite").saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner emits
    * no Exchange when both sides were written via [[writeBucketed]]
    * with equal bucket counts. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Small-file compaction — the lake-maintenance pass every
    * continuously-ingested store needs: streaming sinks and
    * per-harvest appends leave thousands of KB-sized files whose
    * open/footer overhead dominates scans and whose count bloats the
    * driver's listing. Rewrite the path into ceil(bytes/target)
    * roughly-equal files. Row-size is estimated from the existing
    * files' on-disk bytes (parquet-compressed, the figure that
    * matters), and the rewrite swaps directories by renaming the old
    * data ASIDE first (dst -> dst._compact_old, tmp -> dst, delete
    * old) so a crash at any single point leaves the full dataset
    * present at either dst or dst._compact_old — never absent. The
    * window between the two renames is still non-atomic (a concurrent
    * reader can catch dst missing for one metadata op), and directory
    * rename itself is copy-based on object stores: on S3-class
    * storage run compaction behind a table format or a writer lock. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "._compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "._compact_old")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(old, true)            // leftover from a prior crash
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compact: rename $dst -> $old failed")
    if (!fs.rename(tmp, dst)) {     // restore the original on failure
      fs.rename(old, dst)
      throw new java.io.IOException(s"compact: rename $tmp -> $dst failed")
    }
    fs.delete(old, true)
  }

  /** Morton (Z-order) value of a lat/lon pair: each coordinate
    * quantized to `bits` bits over its full range, bits interleaved
    * (lon even positions, lat odd). Points close on the globe get
    * close z-values, which is the whole trick behind [[writeZOrdered]]:
    * pure integer Column arithmetic, no UDF. */
  def zValue(lat: org.apache.spark.sql.Column,
      lon: org.apache.spark.sql.Column, bits: Int = 16)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    val n = (1L << bits).toDouble
    val iy = least(floor((lat + 90.0) / 180.0 * n), lit((1L << bits) - 1)).cast("long")
    val ix = least(floor((lon + 180.0) / 360.0 * n), lit((1L << bits) - 1)).cast("long")
    // spread each coordinate's bit k to position 2k, then interleave
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until bits).map(k =>
        shiftleft(shiftright(c, k).bitwiseAND(1L), 2 * k): org.apache.spark.sql.Column)
        .reduceLeft(_.bitwiseOR(_))
    spread(ix).bitwiseOR(shiftleft(spread(iy), 1))
  }

  /** Z-order-clustered parquet layout for spatial data — the scan-
    * pruning counterpart of [[writeBucketed]]'s join locality: rows
    * sorted globally by Morton value land in files whose lat/lon
    * min/max footer stats cover tiny bounding boxes, so a geo_bbox /
    * geo_distance query's pushed range predicates let the parquet
    * reader skip whole row groups — at 100 TB the difference between
    * scanning a region and scanning the planet. `repartitionByRange`
    * on the z-value gives balanced files without a global sort task;
    * within-partition sort tightens row-group stats further.
    * (Delta/Iceberg OPTIMIZE ZORDER is this exact layout; here it is
    * explicit and engine-free.) */
  def writeZOrdered(df: DataFrame, path: String, latCol: String,
      lonCol: String, numFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    val z = df.withColumn("_z", zValue(col(latCol), col(lonCol), bits))
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
