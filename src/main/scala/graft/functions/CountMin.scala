package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a custom
  * [[TypedImperativeAggregate]] — the bounded-memory FREQUENCY summary
  * completing the mergeable-sketch family (KMV/HLL = distinct count,
  * Misra-Gries = top-k candidates, bottom-k = quantiles, this = point
  * frequency): a depth×width counter matrix; each row increments one
  * counter per hash row; a key's frequency estimate is the MIN over
  * its depth counters — never an underestimate, over by at most
  * eps·N with probability 1-delta for width = e/eps, depth = ln(1/delta).
  *
  * The buffer is depth·width longs per (task, group) REGARDLESS of the
  * key domain (the vocabulary never shuffles — partial matrices merge
  * by element-wise SUM map-side, associative and commutative), and
  * unlike Misra-Gries it supports point queries for ANY key after the
  * fact, not just retained candidates.
  *
  * Determinism contract: the child is the ARRAY of depth bucket
  * indexes, computed OUTSIDE the aggregate by codegen'd md5 Column
  * arithmetic (hash60(key || ':cm<i>') % width) — so the counter
  * matrix is a plain integer-sum table any SQL engine replays by
  * grouping the same md5 buckets, and estimates replay as LEAST(...)
  * over d joined counters. Exact integer arithmetic end to end. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 2, s"width >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "count_min needs array<int> bucket indexes (one per depth row)")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"bucket array has ${arr.numElements()} entries, expected $depth")
      // A null KEY hashes to an all-null bucket array (each depth row's
      // hash of null is null); skip the whole row rather than letting
      // getInt read null slots as 0 — null keys don't count, the same
      // null-drop contract as COUNT(key).
      var anyNull = false
      var i = 0
      while (i < depth && !anyNull) {
        anyNull = arr.isNullAt(i); i += 1
      }
      if (!anyNull) {
        i = 0
        while (i < depth) {
          val b = arr.getInt(i)
          require(b >= 0 && b < width, s"bucket $b out of [0,$width)")
          buf(i * width + b) += 1L
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMin {
  /** Aggregate Column: the depth×width Count-Min matrix (row-major
    * flat array<long>) over per-row bucket-index arrays. */
  def countMin(buckets: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CountMinAgg(GraftSqlBridge.expression(buckets), depth, width)
        .toAggregateExpression())
}
