package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  /** 1 hot key with 20k rows + 200 cold keys with 10 each. */
  private def skewed = {
    val s = spark
    import s.implicits._
    val hot = (1 to 20000).map(i => ("rs_hot", i.toLong))
    val cold = for (k <- 1 to 200; i <- 1 to 10) yield (s"rs_$k", i.toLong)
    (hot ++ cold).toDF("recordset", "v")
  }

  private def dim = {
    val s = spark
    import s.implicits._
    (("rs_hot", "Hot Collection") +:
      (1 to 200).map(k => (s"rs_$k", s"Collection $k")).toList)
      .toDF("recordset", "name")
  }

  test("saltedJoin equals the plain join row-for-row") {
    val plain = skewed.join(dim, "recordset")
      .groupBy("recordset", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "recordset", n = 8)
      .groupBy("recordset", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted === plain)
    assert(salted.find(_._1 == "rs_hot").get._3 === 20000L)
  }

  test("saltedJoin shuffles on (key, salt) so the hot key spreads over n reducers") {
    val joined = Skew.saltedJoin(skewed, dim, "recordset", n = 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
    // the hot key's rows really land in >1 shuffle partition: count
    // distinct salts materialized for it
    val salts = skewed.withColumn("_salt",
        pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(8)).cast("int"))
      .where(col("recordset") === "rs_hot")
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(salts === 8L)
  }

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    val s = spark
    val prev = Map(
      "spark.sql.adaptive.enabled" -> s.conf.getOption("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.enabled" -> s.conf.getOption("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> s.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> s.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> s.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.autoBroadcastJoinThreshold" -> s.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
    )
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-scale thresholds: any partition > 8 KB and > 1x median is skewed
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      // force SMJ: AQE skew split applies to sort-merge joins
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = skewed.join(dim, "recordset")
      // execute THIS QueryExecution: AdaptiveSparkPlanExec finalizes its
      // plan in place, so the skew split is only visible after running it
      assert(joined.collect().length === 20000 + 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
