package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared manual serde for `Map[String, Long]` aggregation buffers.
  * The reference Java-serializes its buffers (reference: scala/.../base/Utils.scala:41-53);
  * a length-prefixed DataOutputStream encoding is smaller and faster.
  */
private[graft] object CountMapSerde {
  def write(m: mutable.Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }
  def read(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    m
  }
  def toCatalystMap(m: collection.Map[String, Long]): ArrayBasedMapData = {
    val ks = new Array[Any](m.size)
    val vs = new Array[Any](m.size)
    var i = 0
    m.foreach { case (k, v) => ks(i) = UTF8String.fromString(k); vs(i) = v; i += 1 }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }
}

/** Distributed co-occurrence counter over every `nCombination`-sized combination of the
  * attribute columns. For each row and combination `(c1,c2)` with values `(v1,v2)` it emits
  * key `"c1,c2;v1,v2"` and counts occurrences.
  *
  * Semantics match the reference (reference: scala/.../expressions/ARC_CombinatorialCountAgg.scala:9-69):
  *   - keys with count <= `threshold` are dropped at merge time (strict `>`, ref :39);
  *   - final eval keeps the top `topK` keys by count (ref :44 hard-codes 1000);
  *   - values are stringified; nulls become the `"null_"` sentinel (callers fill first,
  *     reference python/arc/autolinker/autolinker.py:138,287 — we also guard here).
  *
  * Scale note: the merge-time prune + eval-time cap bound both buffer memory and output
  * size, which is what makes this usable as a partial aggregate over billions of rows —
  * pair it with random bucketing (see blocking.RuleGen) exactly like the reference.
  */
case class CombinatorialCountAgg(
    attributes: Seq[Expression],
    attributeNames: Seq[String],
    nCombination: Int,
    threshold: Long = 1L,
    topK: Int = 1000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  // Enumerated once per instance, not per row (ref :20).
  @transient private lazy val combos: Array[(String, Array[Int])] =
    attributeNames.indices
      .combinations(nCombination)
      .map { idx =>
        (idx.map(attributeNames).mkString(","), idx.toArray)
      }
      .toArray

  override def children: Seq[Expression] = attributes
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buffer: mutable.Map[String, Long],
      input: InternalRow): mutable.Map[String, Long] = {
    val vals = new Array[String](attributes.length)
    var i = 0
    while (i < attributes.length) {
      val v = attributes(i).eval(input)
      vals(i) = if (v == null) "null_" else v.toString
      i += 1
    }
    combos.foreach { case (colKey, idx) =>
      val sb = new java.lang.StringBuilder(colKey)
      sb.append(';')
      var j = 0
      while (j < idx.length) {
        if (j > 0) sb.append(',')
        sb.append(vals(idx(j)))
        j += 1
      }
      val key = sb.toString
      buffer.update(key, buffer.getOrElse(key, 0L) + 1L)
    }
    buffer
  }

  override def merge(
      buffer: mutable.Map[String, Long],
      other: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    other.foreach { case (k, v) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + v)
    }
    // Prune keys at/below threshold during merge — bounds buffer growth (ref :37-41).
    buffer.filterInPlace { case (_, v) => v > threshold }
    buffer
  }

  override def eval(buffer: mutable.Map[String, Long]): Any = {
    val kept =
      if (buffer.size <= topK) buffer
      else mutable.LinkedHashMap(buffer.toSeq.sortBy(-_._2).take(topK): _*)
    CountMapSerde.toCatalystMap(kept)
  }

  override def serialize(buffer: mutable.Map[String, Long]): Array[Byte] =
    CountMapSerde.write(buffer)
  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] =
    CountMapSerde.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CombinatorialCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CombinatorialCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CombinatorialCountAgg =
    copy(attributes = newChildren)
}

/** Key-wise sum of many `Map[String, Long]` columns into one
  * (reference: scala/.../expressions/ARC_MergeCountMapAgg.scala:10-55).
  */
case class MergeCountMapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buffer: mutable.Map[String, Long],
      input: InternalRow): mutable.Map[String, Long] = {
    val m = child.eval(input)
    if (m != null) {
      val map = m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = map.keyArray()
      val vs = map.valueArray()
      var i = 0
      while (i < map.numElements()) {
        val k = ks.getUTF8String(i).toString
        buffer.update(k, buffer.getOrElse(k, 0L) + vs.getLong(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(
      buffer: mutable.Map[String, Long],
      other: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    other.foreach { case (k, v) => buffer.update(k, buffer.getOrElse(k, 0L) + v) }
    buffer
  }

  override def eval(buffer: mutable.Map[String, Long]): Any =
    CountMapSerde.toCatalystMap(buffer)

  override def serialize(buffer: mutable.Map[String, Long]): Array[Byte] =
    CountMapSerde.write(buffer)
  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] =
    CountMapSerde.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeCountMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeCountMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MergeCountMapAgg =
    copy(child = newChildren.head)
}
