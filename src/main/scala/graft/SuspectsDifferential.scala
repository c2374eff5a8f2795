package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential audit of the ingest-suspects gate against the
  * reference's is_row_suspect (ds_sum_counts.py:52-97) — replays
  * tools/gen_suspects_differential.py vectors through
  * [[graft.ingest.SummaryChecks.suspectTag]]. */
object SuspectsDifferential {
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/suspdiff/vectors.tsv"
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rows = scala.io.Source.fromFile(path).getLines().map { l =>
      val p = l.split("\t")
      (p(0).toLong, p(1) == "1", p(2).toLong, p(3).toLong, p(4).toLong,
        p(5).toLong, p(6).toLong, p(7).toLong, p(8).toLong, p(9).toLong,
        p(10))
    }.toSeq
    val df = rows.toDF("id", "ok", "rc", "rcr", "rup", "rdel",
      "mc", "mcr", "mup", "mdel", "expect")
    val out = df.select(col("id"), col("expect"),
      coalesce(graft.ingest.SummaryChecks.suspectTag(col("ok"),
        col("rc"), col("rcr"), col("rup"), col("rdel"),
        col("mc"), col("mcr"), col("mup"), col("mdel")), lit("OK")).as("got"))
      .collect()
    var bad = 0
    out.foreach { r =>
      if (r.getString(1) != r.getString(2)) {
        bad += 1
        if (bad <= 20)
          println(s"[diff] id=${r.getLong(0)} ref=${r.getString(1)} engine=${r.getString(2)}")
      }
    }
    println(s"[suspdiff] ${out.length - bad}/${out.length} agree ($bad mismatches)")
    spark.stop()
  }
}
