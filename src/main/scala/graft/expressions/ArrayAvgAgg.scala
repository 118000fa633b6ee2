package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise average of `array<double>` rows — embedding mean-pooling
  * (chunk→document, token→passage) as ONE distributed aggregate.
  *
  * Buffer = (running sum vector, count): `dim` doubles per GROUP, combined
  * map-side by partial aggregation and merged as fixed-size vector adds. The
  * relational alternative (posexplode + `groupBy(id, pos)` + re-assemble) shuffles
  * `dim` rows per input vector and needs a second stage to rebuild arrays; this
  * shuffles one small buffer per group.
  *
  * NULL rows — and rows whose array CONTAINS a null element — are ignored whole
  * (SQL AVG semantics at row granularity; silently reading a null slot as 0.0
  * would skew the pooled vector with no error). An empty group evaluates to NULL.
  * Mismatched dimensions raise — ragged embeddings are a data bug, not mergeable
  * state.
  */
case class ArrayAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayAvgAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): ArrayAvgAgg.Buf = new ArrayAvgAgg.Buf(null, 0L)

  override def update(buffer: ArrayAvgAgg.Buf, input: InternalRow): ArrayAvgAgg.Buf = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    // a null ELEMENT would read back as 0.0 from the array data — drop the row
    // whole rather than silently pool a fabricated zero
    var j = 0
    while (j < dim) {
      if (arr.isNullAt(j)) return buffer
      j += 1
    }
    if (buffer.sum == null) buffer.sum = new Array[Double](dim)
    require(buffer.sum.length == dim,
      s"array_avg_agg: mismatched dimensions ${buffer.sum.length} vs $dim")
    var i = 0
    while (i < dim) {
      buffer.sum(i) += arr.getDouble(i)
      i += 1
    }
    buffer.n += 1L
    buffer
  }

  override def merge(buffer: ArrayAvgAgg.Buf, other: ArrayAvgAgg.Buf): ArrayAvgAgg.Buf = {
    if (other.sum == null) return buffer
    if (buffer.sum == null) { buffer.sum = other.sum.clone(); buffer.n = other.n; return buffer }
    require(buffer.sum.length == other.sum.length,
      s"array_avg_agg: mismatched dimensions ${buffer.sum.length} vs ${other.sum.length}")
    var i = 0
    while (i < buffer.sum.length) {
      buffer.sum(i) += other.sum(i)
      i += 1
    }
    buffer.n += other.n
    buffer
  }

  override def eval(buffer: ArrayAvgAgg.Buf): Any = {
    if (buffer.n == 0L || buffer.sum == null) return null
    val out = new Array[Any](buffer.sum.length)
    var i = 0
    while (i < buffer.sum.length) {
      out(i) = buffer.sum(i) / buffer.n
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: ArrayAvgAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val dim = if (buffer.sum == null) -1 else buffer.sum.length
    out.writeInt(dim)
    if (dim >= 0) { var i = 0; while (i < dim) { out.writeDouble(buffer.sum(i)); i += 1 } }
    out.writeLong(buffer.n)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayAvgAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val dim = in.readInt()
    val sum = if (dim < 0) null else {
      val a = new Array[Double](dim)
      var i = 0
      while (i < dim) { a(i) = in.readDouble(); i += 1 }
      a
    }
    new ArrayAvgAgg.Buf(sum, in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArrayAvgAgg =
    copy(child = newChildren.head)
}

object ArrayAvgAgg {
  /** Mutable (sum, count) pair; `sum` stays null until the first non-null row fixes
    * the dimension.
    */
  final class Buf(var sum: Array[Double], var n: Long)
}
