package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register sketch (Flajolet et al. 2007) as a custom
  * [[TypedImperativeAggregate]] — the CONSTANT-memory distinct-count
  * summary next to [[KmvAgg]]'s k-bounded one: the buffer is exactly
  * `m` bytes per group no matter the cardinality, tasks ship those m
  * bytes once, and merging is an element-wise byte max (associative,
  * commutative, idempotent — per-day / per-shard sketches roll up in
  * any tree without rescanning, and a duplicate merge is harmless).
  *
  * Spark's own `approx_count_distinct` IS HLL++, but its register
  * layout and bias tables are engine-private — nothing outside the
  * JVM can replay the estimate, so it can't sit under a cross-engine
  * correctness gate. This sketch is built deterministically from the
  * repo-standard md5-derived 60-bit hash ([[graft.operators.TextDedup.hash60]]):
  *   bucket = h >>> (60 - log2 m)   (top bits),
  *   rho    = leading zeros of the remaining 52 bits + 1 ∈ [1, 53],
  * and the register array it emits is plain `array<int>` — every step
  * (integer shifts, `bin()` bit lengths, an integer sum of powers of
  * two, one double division) replays bit-for-bit in any SQL engine.
  * The estimator lives in [[graft.operators.Sketches.hllEstimate]].
  *
  * Input column must be hash60-uniform (values in [0, 2^60)); rows
  * outside that range would silently skew buckets, so update throws. */
case class HllAgg(
    child: Expression,
    m: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 16 && (m & (m - 1)) == 0, s"HLL registers must be a power of 2 >= 16, got $m")
  /** log2(m): bucket bits taken from the top of the 60-bit hash. */
  private val p: Int = java.lang.Integer.numberOfTrailingZeros(m)
  /** Bits left for the rho scan (60 - p); rho ∈ [1, wBits + 1]. */
  private val wBits: Int = 60 - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_sketch"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("hll_sketch needs a bigint hash60")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0 && h < (1L << 60), s"hash60 out of range: $h")
      val bucket = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      // leading zeros within the wBits window, +1 (classic HLL rho);
      // w == 0 -> all wBits zero -> rho = wBits + 1
      val rho =
        if (w == 0L) wBits + 1
        else wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HyperLogLog {
  /** Aggregate Column: the m-register HLL sketch of a hash60 column,
    * emitted as array<int> of register values (0 = never touched). */
  def hllSketch(hash: Column, m: Int = 256): Column =
    GraftSqlBridge.column(
      HllAgg(GraftSqlBridge.expression(hash), m).toAggregateExpression())
}
