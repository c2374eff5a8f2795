package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: runs SparkEntry.entry exactly as the harness
  * does (rows > 0 on sf0.001) and prints the plan + row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // see Bench.scala: fused methods past the JIT limit run interpreted
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    rows.foreach(r => println(s"[smoke] $r"))
    println(s"[smoke] entry rows=${rows.length} (driver requires > 0)")
    spark.stop()
  }
}
