package graft.queries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Temporary round-15 diagnostic: where q_kcore_order's time goes.
object DiagK {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(graft.Tables.lineitem(spark, dir).groupBy(col("l_returnflag")).count())
    val edges = graft.Tables.events(spark, dir)
      .select((col("event_id") % 499).as("src"),
        (col("event_id") % (col("event_id") % 359 + 2) + 500).as("dst"))
    time("edges distinct+count (undirect proxy)") {
      println("    distinct edges: " + edges
        .where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
        .distinct().count())
    }
    def full(label: String): Unit = {
      time(label) {
        val (res, sweeps, conv) = graft.operators.Graph
          .kCoreNumbersConverged(edges, "src", "dst", 20)
        noop(res)
        println(s"    sweeps=$sweeps converged=$conv")
      }
      graft.Staging.releasePinned(spark)
    }
    full("warm-up run")
    Seq(1, 3, 6).foreach { k =>
      time(s"iters=$k") {
        noop(graft.operators.Graph.kCoreNumbers(edges, "src", "dst", k))
      }
      graft.Staging.releasePinned(spark)
    }
    full("default AQE")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    full("AQE off")
    Seq(1, 3, 6).foreach { k =>
      time(s"AQE off iters=$k") {
        noop(graft.operators.Graph.kCoreNumbers(edges, "src", "dst", k))
      }
      graft.Staging.releasePinned(spark)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
