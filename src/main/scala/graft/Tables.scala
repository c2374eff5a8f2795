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

  /** Column-name contract per table (TESTDATA.md tables, snapshotted from
    * the harness parquet). Column NAMES are the stable interface queries
    * compile against; physical TYPES may change vintage (events.ts has
    * shipped as both TIMESTAMP(NANOS) and TIMESTAMP_NTZ(MICROS) — see
    * `events`), so only names are asserted. A mismatch fails loudly with
    * a named diagnosis instead of 16 queries dying one analysis error at
    * a time, as happened when the round-10 regen changed events.ts. */
  private val expectedCols: Map[String, Set[String]] = Map(
    "region"     -> Set("r_regionkey", "r_name"),
    "nation"     -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    expectedCols.get(name).foreach { expected =>
      val actual = df.schema.fieldNames.toSet
      if (actual != expected) {
        val missing = expected -- actual
        val extra   = actual -- expected
        throw new IllegalStateException(
          s"testdata schema drift: $sfDir/$name.parquet columns changed " +
          s"(missing=${missing.toSeq.sorted.mkString(",")} " +
          s"extra=${extra.toSeq.sorted.mkString(",")}) — the harness " +
          "likely regenerated /root/testdata; update Tables.expectedCols " +
          "and audit type-sensitive readers (Tables.events).")
      }
    }
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (which vanilla
    * Spark rejects — read as long via the legacy conf, then surface
    * micros) and, after a harness regeneration, as TIMESTAMP(MICROS)
    * without timezone (Spark reads TIMESTAMP_NTZ). Adapt on the actual
    * read schema so either vintage of the files loads; every caller gets
    * a session-TZ TimestampType `ts` (all graft entry points pin
    * spark.sql.session.timeZone=UTC, so the NTZ→TZ cast is the identity
    * wall-clock mapping and oracle hash parity is host-TZ-independent). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType      => // nanos vintage: surfaced as long by the legacy conf
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => // TIMESTAMP_NTZ (micros, no tz) or future vintages
        df.withColumn("ts", col("ts").cast(TimestampType))
    }
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
