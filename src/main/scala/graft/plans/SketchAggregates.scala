package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Misra–Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — the deepest Catalyst aggregate extension
  * form (raw mutable buffer + custom serialization), reserved by SURVEY §4
  * for sketch aggregates the built-ins don't cover.
  *
  * Semantics: bounded-memory frequency counting with at most `capacity`
  * tracked keys. When the input's distinct-key count is ≤ capacity the
  * counts are EXACT (no decrement ever fires) — which is what makes the
  * oracle query checkable; beyond capacity it degrades gracefully to the
  * classic ε=1/capacity heavy-hitters guarantee. Merge-able, so partial
  * aggregation (map-side combine) works — the 100 TB path: per-partition
  * sketches of fixed size shuffle instead of raw rows.
  *
  * Output: array<struct<token string, cnt long>> sorted by (cnt desc,
  * token asc) — deterministic for comparison.
  */
case class FrequentItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("cnt", LongType))))
  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(k)
      if (cur != 0L || buf.containsKey(k)) buf.put(k, cur + 1)
      else if (buf.size < capacity) buf.put(k, 1L)
      else decrementAll(buf, 1L) // Misra–Gries: decrement all on overflow
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long], b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach { (k, v) =>
      val cur = a.get(k) // null unboxes to 0 for absent keys
      a.put(k, cur + v)
    }
    // trim back to capacity: subtract the (capacity+1)-th largest count
    if (a.size > capacity) {
      val counts = a.values().toArray(Array.empty[java.lang.Long]).map(_.longValue).sorted(Ordering[Long].reverse)
      decrementAll(a, counts(capacity))
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = buf.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
      .sortBy(e => (-e.getValue, e.getKey))
    new GenericArrayData(entries.map(e =>
      InternalRow(UTF8String.fromString(e.getKey), e.getValue): Any))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len); in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SketchFunctions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** frequent-items aggregate Column (exact when distinct keys <= capacity) */
  def freqItems(c: Column, capacity: Int): Column =
    Bridge.column(FrequentItemsSketch(Bridge.expression(c), capacity).toAggregateExpression())
}
