package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential audit of the permissive date parser against dateutil
  * itself: tools/gen_date_differential.py generates structured-random
  * vectors across every claimed family and records dateutil 2.9's
  * parse (uppercased, default 0001-01-01, naive pinned to UTC —
  * reference conversions.py:585-598); this main replays them through
  * [[graft.etl.Grabbers.permissiveTimestamp]] and prints mismatches.
  * Results per round are archived in BENCH_NOTES.md. */
object DateDifferential {
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/datediff/vectors.tsv"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vecs = scala.io.Source.fromFile(path).getLines().map { l =>
      val i = l.lastIndexOf('\t')
      (l.substring(0, i), l.substring(i + 1))
    }.toSeq
    val df = vecs.toDF("x", "expect")
    val rows = df.select(col("x"), col("expect"),
      unix_micros(graft.etl.Grabbers.permissiveTimestamp(col("x"))).as("got"))
      .collect()
    var bad = 0
    rows.foreach { r =>
      val exp = r.getString(1)
      val got = if (r.isNullAt(2)) "NULL" else r.getLong(2).toString
      if (exp != got) {
        bad += 1
        if (bad <= 60) println(s"[diff] '${r.getString(0)}' dateutil=$exp engine=$got")
      }
    }
    println(s"[differential] ${rows.length - bad}/${rows.length} agree ($bad mismatches)")
    spark.stop()
  }
}
