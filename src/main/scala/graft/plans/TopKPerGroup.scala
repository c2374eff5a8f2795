package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Exact top-k-per-group as a first-class operator — the whole-operator
  * tier of SURVEY §2.11 (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, registered per-session or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * Built-in Spark expresses per-group top-k as a row_number window:
  * hash-shuffle on the group key, then a FULL in-partition sort of
  * every row before ranks are filtered. This operator keeps the same
  * single shuffle (`requiredChildDistribution` = clustered on the
  * group key — Catalyst inserts exactly the one Exchange) but replaces
  * the sort with per-group k-bounded binary heaps: O(n log k) compare
  * work and O(groups·k) memory instead of an O(n log n) sort that
  * spills whole partitions. At 100 TB with hot groups (the quota
  * sampler's use) the sort IS the cost; the heap never materializes
  * more than k rows per group.
  */
case class TopKPerGroupPlan(group: Seq[Attribute], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Physical heap-per-group implementation. */
case class TopKPerGroupExec(group: Seq[Attribute], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(group) :: Nil
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (groupExprs, sortOrder, kk, childOutput, out) =
      (group, order, k, child.output, output)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val base = GenerateOrdering.generate(sortOrder, childOutput)
      val ord = new Ordering[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = base.compare(a, b)
      }
      // PriorityQueue dequeues the LARGEST first → heap head is the
      // worst kept row; a new row replaces it when strictly better
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[InternalRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          scala.collection.mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kk) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy()
        }
      }
      val rank = new GenericInternalRow(1)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(out, out)
      heaps.valuesIterator.flatMap { heap =>
        val ascending = heap.dequeueAll.reverseIterator
        ascending.zipWithIndex.map { case (r, i) =>
          rank.setInt(0, i + 1)
          outProj(joined(r, rank))
        }
      }
    }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, r, child) =>
      TopKPerGroupExec(g, o, k, r, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Top-k rows per group, ascending by `orderCols` (make the order
    * total — include a unique tiebreaker — for deterministic ranks,
    * exactly as a row_number window requires). Appends a 1-based
    * `rankName` column. Registers [[TopKStrategy]] in the session on
    * first use. */
  def topK(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      k: Int, rankName: String = "pick_rank"): DataFrame =
    topKSorted(df, groupCols, orderCols.map(_ -> true), k, rankName)

  /** As [[topK]] with per-column direction: (name, ascending). */
  def topKSorted(df: DataFrame, groupCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int,
      rankName: String = "pick_rank"): DataFrame = {
    // k=0 would NoSuchElementException on the empty heap's head at
    // execution time; fail at plan build instead
    require(k >= 1, s"topK requires k >= 1, got $k")
    val spark: SparkSession = df.sparkSession
    GraftSqlBridge.addStrategy(spark, TopKStrategy)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(",")}"))
    GraftSqlBridge.ofRows(spark, TopKPerGroupPlan(
      groupCols.map(attr),
      order.map { case (c, asc) =>
        SortOrder(attr(c), if (asc) Ascending else Descending) },
      k,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      analyzed))
  }
}
