package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time a comma-separated subset of SparkEntry.queries in
  * one warm session (same config as [[Bench]]), printing per-query
  * seconds plus start/end parallel canaries — the local feedback loop
  * for plan work on one family without paying the full 177-query run.
  * Args: <sfDir> <q1,q2,...> [reps]. Queries run in the given ORDER
  * (staging-sensitive families care), each `reps` times. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    try { run("q1_agg"); run("q_join_equi") } catch { case _: Throwable => }
    Bench.parallelCanaryMs(spark)
    println(f"par_canary_start_ms=${Bench.parallelCanaryMs(spark)}%.0f")
    (1 to reps).foreach { r =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        run(name)
        println(f"[$r] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    println(f"par_canary_end_ms=${Bench.parallelCanaryMs(spark)}%.0f")
    spark.stop()
  }
}
