package graft

import org.apache.spark.sql.SparkSession

/** Dumps the whole-stage-generated Java for a SparkEntry query so
  * oversized methods (JVM 64 KB limit → Janino failure → interpreted
  * fallback) can be located. Usage: runMain graft.CodegenDump <query> <sfDir>. */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("MAXF", "100"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    import org.apache.spark.sql.execution.debug._
    // scalastyle:off println
    println(df.debugCodegen())
    // scalastyle:on println
    spark.stop()
  }
}
