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

  test("compact folds a many-small-file path into size-targeted files, " +
      "rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1L to 20000L).map(i => (i, s"payload-$i")).toDF("id", "v")
    df.repartition(64).write.parquet(dir)   // 64 tiny files
    def files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
    val before = files.length
    assert(before === 64)
    val total = files.map(_.length).sum
    Layout.compact(spark, dir, targetFileBytes = total / 4)
    assert(files.length <= 6, s"expected ~4-5 files, got ${files.length}")
    val back = spark.read.parquet(dir)
    assert(back.count() === 20000L)
    assert(back.agg(sum("id")).head().getLong(0) === 20000L * 20001L / 2)
    // the swap's working dirs are gone: a crashed run keeps the data
    // at either dst or dst._compact_old, a finished run leaves neither
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles.exists(f =>
        f.getName.endsWith("._compact_tmp") ||
        f.getName.endsWith("._compact_old")),
      parent.listFiles.map(_.getName).mkString(","))
  }

  test("zValue: interleaving is correct and preserves locality") {
    val pts = Seq(
      (-90.0, -180.0),  // cell (0,0) -> z 0
      (10.0, 20.0), (10.01, 20.01),   // neighbors
      (10.0, -150.0),                 // same lat, far lon
      (89.999, 179.999))              // top corner cell -> max z
      .toDF("lat", "lon")
    val z = pts.select(Layout.zValue(col("lat"), col("lon"), bits = 16))
      .collect().map(_.getLong(0))
    assert(z(0) === 0L)
    assert(z(4) === (1L << 32) - 1, "corner cell must fill all 32 bits")
    // the 0.01-degree neighbor is z-closer than the far-longitude point
    assert(math.abs(z(1) - z(2)) < math.abs(z(1) - z(3)))
  }

  test("z-ordered layout: per-file bounding boxes shrink vs insertion order") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // 20k points in insertion order that deliberately destroys spatial
    // locality (successive rows jump across the globe)
    val pts = (1 to 20000).map { i =>
      ((i * 7919 % 18000) / 100.0 - 90.0, (i * 104729 % 36000) / 100.0 - 180.0, i.toLong)
    }.toDF("lat", "lon", "id")
    pts.repartition(8).write.mode("overwrite").parquet(s"$dir/plain")
    // 64 z-runs: locality scales with file count (8 files only cut the
    // area ~5× — a contiguous z-range still spans curve jumps; more,
    // smaller runs is exactly how the layout is used at scale)
    Layout.writeZOrdered(pts, s"$dir/z", "lat", "lon", numFiles = 64)

    def meanBoxArea(path: String): Double = {
      val per = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("lat") - min("lat")) * (max("lon") - min("lon"))).as("a"))
        .collect().map(_.getDouble(1))
      per.sum / per.length
    }
    val (plain, zed) = (meanBoxArea(s"$dir/plain"), meanBoxArea(s"$dir/z"))
    // 8 z-runs over the globe → each file covers a small fraction of
    // the 180×360 rectangle; the scattered layout's files cover ~all
    // of it. An order of magnitude is the conservative floor.
    assert(zed < plain / 10.0,
      s"z-ordered files must be spatially tight: z=$zed plain=$plain")

    // and the tight footer stats actually prune: a bbox scan over the
    // z layout reads fewer rows out of the parquet reader than the
    // scattered layout (row-group statistics skipping)
    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("lat").between(10.0, 12.0) && col("lon").between(20.0, 22.0))
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val (rowsPlain, rowsZ) = (scannedRows(s"$dir/plain"), scannedRows(s"$dir/z"))
    assert(rowsZ <= rowsPlain,
      s"z layout must never scan more ($rowsZ vs $rowsPlain)")
  }
}
