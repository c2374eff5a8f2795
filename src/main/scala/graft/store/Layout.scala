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
}
