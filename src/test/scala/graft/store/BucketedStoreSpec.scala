package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB co-location lever the store scaladoc promises: uuid- and
  * etag-keyed store tables written with bucketBy join WITHOUT any
  * exchange of either side — at cluster scale the uuids ⋈ uuids_data ⋈
  * data dereference chain then never reshuffles the big tables, only
  * reads co-located buckets. Asserted on the physical plan so a write
  * path change can't silently lose it. */
class BucketedStoreSpec extends SparkSpec {

  test("bucketed uuid tables join with zero exchanges") {
    val s = spark
    import s.implicits._
    val uuids = (1 to 2000).map(i => (f"uuid$i%05d", i % 7 != 0))
      .toDF("uuid", "active")
    val versions = (1 to 2000).flatMap(i =>
      (1 to 2).map(v => (f"uuid$i%05d", v.toLong, s"etag$i-$v")))
      .toDF("uuid", "version", "etag")
    // a killed test JVM leaves the warehouse DIRECTORY behind while the
    // in-memory catalog forgets the table — CREATE then fails with
    // LOCATION_ALREADY_EXISTS; drop both layers before writing
    Seq("g_uuids_bucketed", "g_versions_bucketed").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    uuids.write.mode("overwrite").format("parquet")
      .bucketBy(8, "uuid").sortBy("uuid").saveAsTable("g_uuids_bucketed")
    versions.write.mode("overwrite").format("parquet")
      .bucketBy(8, "uuid").sortBy("uuid").saveAsTable("g_versions_bucketed")
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = s.table("g_uuids_bucketed")
        .join(s.table("g_versions_bucketed"), "uuid")
        .where(col("active"))
      joined.collect() // force a real execution, not just a plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not reshuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan must be bucket-aware:\n$plan")
    }
  }

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }
}
