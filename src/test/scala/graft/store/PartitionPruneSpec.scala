package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The other half of the store's layout promise (RecordStore scaladoc:
  * "parquet partitioned by entity type, bucketed by uuid"): a
  * type-partitioned store write must let a single-type read prune all
  * other partitions at planning time — at 100 TB, `type = 'records'`
  * must never list, open, or row-filter the mediarecords partitions.
  * Pinned on the scan's PartitionFilters + the partition count actually
  * read, so a layout change can't silently regress to full scans. */
class PartitionPruneSpec extends SparkSpec {

  test("type-partitioned store scan prunes non-matching partitions") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft-test-ppart"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val rows = Seq(
      ("u1", "records", false), ("u2", "records", false), ("u3", "records", true),
      ("m1", "mediarecords", false), ("m2", "mediarecords", false),
      ("rs1", "recordsets", false), ("p1", "publishers", false))
      .toDF("uuid", "type", "deleted")
    rows.write.partitionBy("type").parquet(dir)

    val q = s.read.parquet(dir).filter(col("type") === "records" && !col("deleted"))
    assert(q.count() === 2)

    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the type predicate must be a partition filter, not a data filter
    assert(scan.contains("PartitionFilters") && scan.contains("type#"), scan)
    // and the files actually read come from exactly one partition dir
    val filesRead = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(filesRead === Some(1),
      s"expected exactly the records partition to survive pruning: $filesRead")
  }
}
