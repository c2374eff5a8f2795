package graft
import org.apache.spark.sql.SparkSession
object Peek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("wholeStage=" + spark.conf.get("spark.sql.codegen.wholeStage"))
    val d1 = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.01")
    println("q1_agg spans: " + d1.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.length)
    val df = SparkEntry.queries("q_datum")(spark, "/root/testdata/sf0.01")
    println("q_datum spans: " + df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.length)
    println(df.queryExecution.executedPlan.toString.linesIterator.map(_.take(100)).take(40).mkString("\n"))
    spark.stop()
  }
}
