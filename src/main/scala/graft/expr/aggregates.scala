package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Element-wise sum of `array<long>` columns — the k-means re-center
 * aggregate ([[graft.operators.KMeans.fit]]).
 *
 * Why not posexplode + sum: exploding (cid, pos, x) multiplies the
 * aggregated row count by `dims` (64 M hash-agg updates for 1 M x 64-d
 * vectors, PER ITERATION) where this buffer does one array-add per input
 * row. Same exact integer arithmetic — Long addition is associative and
 * commutative, so partial aggregation and merge order cannot change the
 * result and the fit stays bit-reproducible at any parallelism (the
 * property q40's DuckDB oracle replays).
 *
 * All input arrays must share one length (the fit's vectors do by
 * construction); a null input row is ignored (SQL SUM semantics), an
 * all-null group evaluates to null.
 */
case class SumLongArray(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** Empty = "no input seen yet" (the element count is discovered from the
    * first row, so the buffer allocates lazily). */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length == 0) new Array[Long](n) else buf
      var i = 0
      while (i < n) { b(i) += arr.getLong(i); i += 1 }
      b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < b.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SumLongArray =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SumLongArray =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SumLongArray =
    copy(child = c)
}
