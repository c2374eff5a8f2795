package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** A zero-cost whole-stage-codegen span splitter.
  *
  * Problem shape (the wide grabAll enrichment, Enrich.scala): a stack of
  * ~12 thin Projects fuses into ONE WholeStageCodegen `processNext()`.
  * Inside a fused span inputs are Java locals, so Spark cannot split the
  * generated expression code into sub-methods — the single method blows
  * past HotSpot's 8000-byte JIT ceiling (always discarded under
  * `spark.sql.codegen.hugeMethodLimit`) and, on the widest pipelines,
  * Janino's hard 64 KB method limit (compile ERROR). Either way the fused
  * attempt is pure wasted compile time and the whole span falls back to
  * per-operator execution.
  *
  * This node is the surgical fix: a pass-through operator that does NOT
  * implement CodegenSupport, so the planner closes one WholeStageCodegen
  * span below it and opens another above it. Each span then holds one
  * stage GROUP of the pipeline — small enough to compile, JIT, and keep
  * subexpression elimination — while rows cross the boundary as the
  * UnsafeRows the lower span already produces (`doExecute` is literally
  * `child.execute()`; no copy, no buffering, no exchange).
  *
  * Catalyst interop:
  *  - column pruning: the built-in ColumnPruning rule's generic
  *    "inherits output from children" case inserts the pruning Project
  *    below this node, so `enrich(df).select(few)` still prunes the
  *    pipeline;
  *  - CollapseProject cannot merge Projects across the node — that is
  *    the point;
  *  - predicate pushdown does not know the node, so [[BarrierPushdown]]
  *    (registered with the strategy) forwards deterministic Filters
  *    below it, keeping the filter-after-enrich shape scan-pushable.
  */
case class CodegenBarrierPlan(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): CodegenBarrierPlan =
    copy(child = newChild)
}

/** Physical pass-through: executes the child and hands its partitions on
  * untouched. Partitioning/ordering are preserved so no Exchange or Sort
  * is ever inserted on its account. */
case class CodegenBarrierExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override protected def withNewChildInternal(newChild: SparkPlan): CodegenBarrierExec =
    copy(child = newChild)
}

object CodegenBarrierStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CodegenBarrierPlan(child) => CodegenBarrierExec(planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Deterministic filters commute with a pass-through node; pushing them
  * below lets the built-in PushDownPredicate keep walking them through
  * the stage projections toward the scan.
  *
  * FIDELITY NOTE: full pushdown-to-scan needs this rule to interleave
  * with the operator-optimization batch, which only the
  * `spark.sql.extensions=graft.functions.GraftExtensions` registration
  * provides (every session this engine builds — Bench/Verify/Smoke/
  * specs — sets it). The per-session fallback
  * (`experimental.extraOptimizations`) runs in Spark's LAST optimizer
  * batch: the filter still moves below the barrier, but is not walked
  * further that run — correct, just not scan-pushed. */
object BarrierPushdown extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, b @ CodegenBarrierPlan(child)) if cond.deterministic =>
      b.copy(child = Filter(cond, child))
  }
}

object CodegenBarrier {
  /** Wrap `df` in a codegen span boundary. Registers the strategy and
    * the pushdown rule in the session on first use (the cluster-wide
    * path is `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    GraftSqlBridge.addStrategy(spark, CodegenBarrierStrategy)
    GraftSqlBridge.addOptimization(spark, BarrierPushdown)
    GraftSqlBridge.ofRows(spark, CodegenBarrierPlan(df.queryExecution.analyzed))
  }
}
