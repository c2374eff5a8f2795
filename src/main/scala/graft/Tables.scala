package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Loaders for the harness-provided synthetic tables (TESTDATA.md).
  *
  * All operator-conformance queries read these via `spark.read.parquet`
  * so Catalyst gets real datasource scans (filter pushdown, column
  * pruning, partition-sized splits) — the same path a 100 TB parquet
  * lake would use on a cluster.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which vanilla Spark rejects;
    * read it as long (legacy conf) and surface micros precision — every
    * downstream op (window, date_trunc) is at-or-above micros anyway. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Money/measure columns arrive as doubles; all arithmetic that must
    * hash-match the DuckDB oracle is done in exact decimal and only cast
    * back to double at the very end (identical IEEE value on both sides,
    * independent of aggregation order — critical because Spark's partial
    * aggregation reorders float sums across partitions).
    */
  val Money: DecimalType = DecimalType(20, 2)
}
