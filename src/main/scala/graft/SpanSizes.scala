package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator

/** Diagnostic: compile every WholeStageCodegen span of q_enrich /
  * q_enrich_media and print its max generated-method bytecode size vs
  * the 8000-byte HotSpot JIT ceiling. Usage: runMain graft.SpanSizes */
object SpanSizes {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.length > 1) args.toSeq.drop(1)
      else Seq("q_enrich", "q_enrich_media", "q_geo_correct", "q_datum")
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val spans = df.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec => w
      }
      println(s"[spans] $q: ${spans.length} WholeStageCodegen spans")
      spans.zipWithIndex.foreach { case (w, i) =>
        val stats: String = try {
          val (_, cleaned) = w.doCodeGen()
          CodeGenerator.compile(cleaned)._2.toString
        } catch { case e: Throwable => s"COMPILE-FAIL ${e.getMessage.take(60)}" }
        val head = w.child.toString.linesIterator.next().take(90)
        println(s"[spans] $q span#$i bytecode=$stats " + head)
      }
    }
    spark.stop()
  }
}
