package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Randomized cross-checks of the two newest distributed algorithms
  * against independent local reference implementations — seeded, so
  * failures reproduce. */
class RandomizedParitySpec extends SparkSpec {

  test("connectedComponents equals local union-find on random graphs") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val edges = Seq.fill(140)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // local union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min reachable id per node = min over its component's members
      val byRoot = touched.groupBy(id => find(id.toInt))
      val expected = byRoot.values.flatMap { members =>
        val m = members.min
        members.map(_ -> m)
      }.toMap
      val got = Graph.connectedComponents(
          edges.toDF("d1", "d2"), "d1", "d2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"seed $seed")
    }
  }

  test("TopKPerGroup equals the window formulation on random data") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 77)) {
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(9)
      val rows = Seq.fill(400)((s"g${rnd.nextInt(12)}", rnd.nextLong().abs,
        rnd.nextInt(50).toLong))
        .zipWithIndex.map { case ((g, key, v), i) => (g, key, v, i.toLong) }
      val df = rows.toDF("grp", "key", "v", "uid")
      val win = df.withColumn("pick_rank", row_number().over(
          Window.partitionBy("grp").orderBy(col("key"), col("v"), col("uid"))))
        .where(col("pick_rank") <= k)
        .collect().map(_.toSeq).toSet
      val heap = graft.plans.TopKPerGroup.topK(
          df, Seq("grp"), Seq("key", "v", "uid"), k)
        .collect().map(_.toSeq).toSet
      assert(heap === win, s"seed $seed k=$k")
    }
  }
}
