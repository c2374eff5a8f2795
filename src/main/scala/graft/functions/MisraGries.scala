package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a custom
  * [[TypedImperativeAggregate]] — the bounded-memory frequent-items
  * pass a 100 TB pipeline runs instead of a full-vocabulary groupBy:
  * each task folds its partition into a ≤`capacity`-entry counter map
  * (amortized O(1) per row — every decrement round removes `capacity`
  * units that increments paid in), partial summaries MERGE by the
  * Agarwal et al. "Mergeable Summaries" rule (sum counts, subtract the
  * (capacity+1)-th largest, drop non-positives), and only the merged
  * summary crosses the wire. Guarantee (survives merging): every key
  * with true count > n/(capacity+1) is present, and every reported
  * count undercounts by at most n/(capacity+1).
  *
  * The summary is a CANDIDATE set, not a final answer: exact top-k
  * comes from [[graft.operators.Sketches.heavyHitters]]'s second pass
  * (broadcast the candidates, recount them exactly, rank) — the
  * two-pass shape that makes the result independent of partition
  * layout and therefore oracle-checkable. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(capacity >= 1, "capacity >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(
      buf: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.toString
      buf.get(k) match {
        case Some(c) => buf(k) = c + 1
        case None if buf.size < capacity => buf(k) = 1L
        case None =>
          // classic MG decrement round: the unseen key and every
          // counter each give up one unit; zeros vacate their slots
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf(key) = c - 1
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: scala.collection.mutable.HashMap[String, Long],
      other: scala.collection.mutable.HashMap[String, Long])
      : scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // ≤ capacity entries stay strictly positive, and the mergeable-
      // summaries error bound (sum of the parts' bounds) is preserved
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      buf.foreach { case (k, c) =>
        if (c <= d) dead += k else buf(k) = c - d
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    // deterministic emit order: count desc, key asc
    val sorted = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf(new String(kb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Aggregate Column: ≤`capacity`-entry (key, cnt) summary, emitted
    * sorted (cnt desc, key). */
  def misraGries(key: Column, capacity: Int): Column =
    GraftSqlBridge.column(
      MisraGriesAgg(GraftSqlBridge.expression(key), capacity)
        .toAggregateExpression())
}
