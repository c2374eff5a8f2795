package graft
import org.apache.spark.sql.SparkSession
object JudgeRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sf).write.format("noop").mode("overwrite").save()
    try { run("q1_agg"); run("q_join_equi") } catch { case _: Throwable => }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, _) =>
      System.err.println(s"=== START $n")
      val t0 = System.nanoTime()
      try run(n) catch { case t: Throwable => System.err.println(s"FAILED $n: $t") }
      System.err.println(f"=== END $n ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
