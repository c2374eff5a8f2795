package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro–Winkler string similarity — the record-linkage scorer
  * (Winkler's census deduplication metric) Spark lacks natively
  * (it ships levenshtein but not jaro), implemented as a codegen'd
  * kernel so a blocking join can score candidate pairs at scan speed
  * inside WholeStageCodegen. Semantics pinned to the textbook
  * algorithm DuckDB's `jaro_winkler_similarity` implements (verified
  * against its outputs in StringSimSpec — the oracle replays the
  * scores): match window floor(max/2)−1, greedy left-to-right
  * matching, transpositions = FLOOR of half the mismatched
  * matched-sequence positions (an 8,000-vector fuzz against DuckDB
  * pinned the floor — the fractional-t textbook variant diverges on
  * repeated-character strings where greedy alignment yields an odd
  * mismatch count, e.g. digit-heavy ids), both-empty = 0.0 (DuckDB's
  * convention, not the textbook 1.0), and the Winkler prefix boost
  * l·0.1·(1−j) (l ≤ 4) applied only when jaro > 0.7.
  *
  * Unit of comparison: UTF-8 BYTES, not chars or code points —
  * probed empirically, DuckDB scores 'café' vs 'cafe' as 5-vs-4
  * units (0.78333…, the byte lengths), not 4-vs-4 (0.83333…, the
  * code-point lengths). Operating directly on `UTF8String.getBytes`
  * gives exact DuckDB parity on ALL inputs including non-ASCII
  * (pinned by the non-ASCII vectors in StringSimSpec) and skips the
  * UTF-16 String materialization the hot loop would otherwise pay.
  */
object StringSimKernel {

  def jaro(u1: UTF8String, u2: UTF8String): Double = {
    val a = u1.getBytes
    val b = u2.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && b(j) == a(i)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // t/2 in INTEGER division: DuckDB floors the transposition count
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  def jaroWinkler(u1: UTF8String, u2: UTF8String): Double = {
    val j = jaro(u1, u2)
    if (j <= 0.7) return j
    val a = u1.getBytes
    val b = u2.getBytes
    val max = math.min(4, math.min(a.length, b.length))
    var l = 0
    while (l < max && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "jaro_winkler needs (string, string)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  protected override def nullSafeEval(s1: Any, s2: Any): Any =
    StringSimKernel.jaroWinkler(s1.asInstanceOf[UTF8String],
      s2.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernel.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object StringSim {
  /** Column: Jaro–Winkler similarity in [0, 1] (codegen'd). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinklerExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
