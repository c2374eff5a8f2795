package graft.plans

import graft.SparkSpec
import graft.functions.{Geohash, GeohashKernel}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class GeohashPruningSpec extends SparkSpec {

  test("kernel matches known geohash reference points") {
    // canonical examples from the public geohash test corpora
    assert(GeohashKernel.encode(57.64911, 10.40744, 11).toString ===
      "u4pruydqqvj")
    assert(GeohashKernel.encode(42.6, -5.6, 5).toString === "ezs42")
    assert(GeohashKernel.encode(-25.382708, -49.265506, 8).toString ===
      "6gkzwgjz")
  }

  test("cover contains the hash of every point inside the box") {
    val cells = Geohash.cover(10.0, 12.0, 20.0, 23.0, 3).toSet
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val lat = 10.0 + rnd.nextDouble() * 2.0
      val lon = 20.0 + rnd.nextDouble() * 3.0
      val h = GeohashKernel.encode(lat, lon, 3).toString
      assert(cells.contains(h), s"($lat,$lon) -> $h not covered")
    }
  }

  test("bbox filter over a ghash-partitioned lake partition-prunes " +
      "and never changes results") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ghash").toString
    val pts = (1 to 5000).map { i =>
      val lat = (i * 7919 % 18000) / 100.0 - 90.0
      val lon = (i * 104729 % 36000) / 100.0 - 180.0
      (i.toLong, lat, lon)
    }.toDF("id", "lat", "lon")
    pts.withColumn("ghash2", Geohash.geohash(col("lat"), col("lon"), 2))
      .write.partitionBy("ghash2").mode("overwrite").parquet(dir)

    val lake = s.read.parquet(dir)
    val totalParts = lake.select(countDistinct(col("ghash2"))).head().getLong(0)
    val q = lake.filter(col("lat").between(10.0, 25.0) &&
      col("lon").between(20.0, 40.0))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("ghash2")),
      s"rule must inject a ghash2 partition filter:\n${scan.partitionFilters}")
    val read = scan.selectedPartitions.partitionCount
    assert(read < totalParts / 4,
      s"box covers a small corner; read $read of $totalParts partitions")

    // correctness: identical rows with the rule bypassed (no ghash col
    // in scope -> rule can't fire)
    val noGhash = s.read.parquet(dir).drop("ghash2")
      .filter(col("lat").between(10.0, 25.0) &&
        col("lon").between(20.0, 40.0))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(q.select(col("id")).collect().map(_.getLong(0)).toSet === noGhash)
  }

  test("rule skips planet-wide boxes (cover beyond MaxCells) and is " +
      "idempotent on already-rewritten filters") {
    val s = spark
    import s.implicits._
    // a parquet-backed frame: a literal LocalRelation would be folded
    // away by ConvertToLocalRelation before the rule could matter
    val dir = java.nio.file.Files.createTempDirectory("ghash4").toString
    Seq((1L, 10.0, 20.0)).toDF("id", "lat", "lon")
      .withColumn("ghash4", Geohash.geohash(col("lat"), col("lon"), 4))
      .write.mode("overwrite").parquet(dir)
    val df = s.read.parquet(dir)
    // planet-wide box at precision 4 -> cover >> MaxCells -> no rewrite
    val wide = df.filter(col("lat").between(-89.0, 89.0) &&
      col("lon").between(-179.0, 179.0))
    val wideCond = wide.queryExecution.optimizedPlan.toString
    assert(!wideCond.contains("ghash4 IN"), wideCond)
    // narrow box: rewritten exactly once despite the fixed-point batch
    val narrow = df.filter(col("lat").between(10.0, 10.1) &&
      col("lon").between(20.0, 20.1))
    val cnt = "ghash4#\\d+ IN".r
      .findAllIn(narrow.queryExecution.optimizedPlan.toString).size
    assert(cnt === 1, narrow.queryExecution.optimizedPlan.toString)
  }

  test("rule honors the session kill-switch and the precision-12 cap") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ghash5").toString
    Seq((1L, 10.05, 20.05)).toDF("id", "lat", "lon")
      .withColumn("ghash4", Geohash.geohash(col("lat"), col("lon"), 4))
      .write.mode("overwrite").parquet(dir)
    def narrowPlan = s.read.parquet(dir)
      .filter(col("lat").between(10.0, 10.1) && col("lon").between(20.0, 20.1))
      .queryExecution.optimizedPlan.toString
    // disabled per session: no IN injected (attributes render with
    // expr ids — "ghash4#<id> IN" — so the negative check must use the
    // same regex as the positive one, not a bare-substring contains)
    s.conf.set(GeohashPruning.EnabledKey, "false")
    try assert("ghash4#\\d+ IN".r.findAllIn(narrowPlan).size === 0, narrowPlan)
    finally s.conf.unset(GeohashPruning.EnabledKey)
    // re-enabled default: rewrites again
    assert("ghash4#\\d+ IN".r.findAllIn(narrowPlan).size === 1)

    // a ghash column above the kernel's precision-12 limit is ignored
    // (cover/encodeCell would overflow 64 bits and drop every row)
    val dir13 = java.nio.file.Files.createTempDirectory("ghash13").toString
    Seq((1L, 10.05, 20.05, "x" * 13)).toDF("id", "lat", "lon", "ghash13")
      .write.mode("overwrite").parquet(dir13)
    val p13 = s.read.parquet(dir13)
      .filter(col("lat").between(10.0, 10.1) && col("lon").between(20.0, 20.1))
      .queryExecution.optimizedPlan.toString
    assert("ghash13#\\d+ IN".r.findAllIn(p13).size === 0, p13)
    // and Geohash.cover itself refuses precision 13
    intercept[IllegalArgumentException] {
      Geohash.cover(10.0, 10.1, 20.0, 20.1, 13)
    }

    // ghash0 must be ignored too, NOT crash planning: cover requires
    // precision >= 1, so the rule's name filter must exclude it
    val dir0 = java.nio.file.Files.createTempDirectory("ghash0").toString
    Seq((1L, 10.05, 20.05, "z")).toDF("id", "lat", "lon", "ghash0")
      .write.mode("overwrite").parquet(dir0)
    val p0 = s.read.parquet(dir0)
      .filter(col("lat").between(10.0, 10.1) && col("lon").between(20.0, 20.1))
      .queryExecution.optimizedPlan.toString  // must not throw
    assert("ghash0#\\d+ IN".r.findAllIn(p0).size === 0, p0)
  }
}
