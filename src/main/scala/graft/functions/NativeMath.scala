package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native numeric kernels for the similarity family (SURVEY §2.11).
  *
  * The dot product folds LEFT-TO-RIGHT over double-widened elements —
  * the exact summation order of both the higher-order
  * `aggregate(zip_with(...))` formulation it replaces and DuckDB's
  * `list_inner_product` on `::DOUBLE[]`, so every ANN oracle stays
  * bit-identical while the per-pair cost drops from an interpreted
  * Column-tree fold (with a zipped intermediate array allocation) to a
  * JIT'd primitive loop. */
object NativeMath {

  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> operands, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    MathKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MathKernel.dot($a, $b, ${isFloat(left)}, ${isFloat(right)});")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : DotProductExpr = copy(left = newLeft, right = newRight)
}

object MathKernel {
  /** Left-to-right double fold of the elementwise product; float
    * elements widen exactly. Mismatched lengths would have produced a
    * null-poisoned fold in the zip_with formulation — not a legal
    * input here (embedding columns are fixed-dim); the shorter length
    * guards against corruption rather than defining semantics. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    if (aFloat && bFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else if (aFloat) {
      while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    } else if (bFloat) {
      while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }
}
