package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  private def data = {
    val s = spark
    import s.implicits._
    // hot group g0 (500 rows) + 50 cold groups, deterministic sort key
    val rows = for (i <- 1 to 1000) yield {
      val g = if (i <= 500) "g0" else s"g${i % 50 + 1}"
      (g, i.toLong, (i * 2654435761L) % 1000003)
    }
    rows.toDF("grp", "id", "key")
  }

  test("matches the row_number window semantics exactly") {
    val viaWindow = data.withColumn("pick_rank",
        row_number().over(Window.partitionBy("grp").orderBy(col("key"), col("id"))))
      .where(col("pick_rank") <= 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val viaHeap = TopKPerGroup.topK(data, Seq("grp"), Seq("key", "id"), k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(viaHeap === viaWindow)
  }

  test("plans one exchange and NO sort — the heap replaces it") {
    val df = TopKPerGroup.topK(data, Seq("grp"), Seq("key", "id"), k = 3)
    df.collect() // finalize any adaptive plan
    // AQE's toString prints final AND initial plans — audit the final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Sort "), s"heap operator must not sort:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1, s"exactly one shuffle:\n$plan")
  }

  test("groups smaller than k emit all their rows, ranked") {
    val s = spark
    import s.implicits._
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    val out = TopKPerGroup.topK(tiny, Seq("grp"), Seq("id"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set(("a", 1L, 1), ("a", 2L, 2), ("b", 3L, 1)))
  }

  test("deterministic under repartitioning") {
    val a = TopKPerGroup.topK(data, Seq("grp"), Seq("key", "id"), 5)
      .collect().map(_.toSeq).toSet
    val b = TopKPerGroup.topK(data.repartition(13), Seq("grp"), Seq("key", "id"), 5)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
