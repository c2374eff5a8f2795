package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-layout co-located joins: the store's scale claim (bucketed
  * by uuid ⇒ shuffle-free key joins) proven on the plan. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero Exchange; unbucketed shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val uuids = (1L to 5000L).map(i => (s"u$i", s"t${i % 3}")).toDF("uuid", "type")
    val log = (1L to 5000L).map(i => (s"u$i", i % 7)).toDF("uuid", "version")
    Layout.writeBucketed(uuids, "layout_uuids", s"$dir/uuids", 8, "uuid")
    Layout.writeBucketed(log, "layout_log", s"$dir/log", 8, "uuid")
    try {
      // force the sort-merge path so the Exchange assertion is about
      // bucketing, not about a broadcast having hidden the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = Layout.bucketedJoin(spark, "layout_uuids", "layout_log", "uuid")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() === 5000)

      // control: the same join over plain parquet reads DOES shuffle
      uuids.write.mode("overwrite").parquet(s"$dir/plain1")
      log.write.mode("overwrite").parquet(s"$dir/plain2")
      val p = spark.read.parquet(s"$dir/plain1")
        .join(spark.read.parquet(s"$dir/plain2"), "uuid")
      assert(p.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS layout_uuids")
      spark.sql("DROP TABLE IF EXISTS layout_log")
    }
  }
}
