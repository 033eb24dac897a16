package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a `TypedImperativeAggregate`: at most
  * `k` (item, count, err) counters; an unseen item evicts the minimum-count
  * counter and inherits its count as `err`. The classic deterministic
  * guarantees survive distributed partial aggregation under the conservative
  * merge below (Agarwal et al., "Mergeable Summaries"):
  *
  *   - any item with true frequency > n/k IS in the sketch;
  *   - for every kept item, count ≥ true ≥ count − err.
  *
  * What is NOT deterministic is the exact counter values for tail items —
  * they depend on partition order. Conformance therefore checks the
  * GUARANTEES (capture + bounds booleans against exact aggregates), never
  * raw sketch counts. At 100 TB this is the top-domains / top-templates
  * operator: k counters per partition and |groups|·k shuffle rows,
  * replacing a full-cardinality groupBy when only heavy keys matter.
  *
  * Eviction and emission tie-break on the item string, so a single-partition
  * sketch is fully deterministic (the spec pins that).
  */
case class FreqSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("cnt", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  /** Min-count entry; ties broken on the LARGER item string so eviction is
    * order-independent given equal buffers. */
  private def minOf(buf: mutable.HashMap[String, (Long, Long)]): (String, Long, Long) = {
    var bi: String = null; var bc = Long.MaxValue; var be = 0L
    buf.foreach { case (i, (c, e)) =>
      if (c < bc || (c == bc && (bi == null || i > bi))) { bi = i; bc = c; be = e }
    }
    (bi, bc, be)
  }

  private def offer(buf: mutable.HashMap[String, (Long, Long)], item: String, add: Long, addErr: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + add, e + addErr))
      case None if buf.size < k => buf.update(item, (add, addErr))
      case None =>
        val (mi, mc, _) = minOf(buf)
        buf.remove(mi)
        buf.update(item, (mc + add, mc + addErr))
    }

  override def update(
      buf: mutable.HashMap[String, (Long, Long)], input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  /** Conservative mergeable-summaries merge: an item absent from one side is
    * assumed to have that side's minimum count (its maximum possible true
    * count there), keeping count an overestimate; then prune back to k. */
  override def merge(
      buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) { other.foreach { case (i, ce) => buf.update(i, ce) }; return buf }
    val m1 = if (buf.size < k) 0L else minOf(buf)._2
    val m2 = if (other.size < k) 0L else minOf(other)._2
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (buf.keySet ++ other.keySet).foreach { i =>
      val (c1, e1) = if (buf.contains(i)) buf(i) else (m1, m1)
      val (c2, e2) = if (other.contains(i)) other(i) else (m2, m2)
      merged.update(i, (c1 + c2, e1 + e2))
    }
    // prune to the k largest counts (ties keep smaller item — mirror of the
    // eviction tie-break)
    val kept =
      if (merged.size <= k) merged
      else {
        val arr = merged.toArray.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
        mutable.HashMap(arr: _*)
      }
    buf.clear()
    kept.foreach { case (i, ce) => buf.update(i, ce) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (i, (c, _)) => (-c, i) }
    new GenericArrayData(sorted.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    })
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, (c, e)) => out.writeUTF(i); out.writeLong(c); out.writeLong(e) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ => val i = in.readUTF(); val c = in.readLong(); val e = in.readLong(); buf.update(i, (c, e)) }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object FreqSketchAggregate {
  /** Column-API entry: SpaceSaving top-k heavy-hitter sketch of a string
    * column — array of (item, cnt, err) ordered cnt desc, item asc. */
  def heavyHitters(item: Column, k: Int): Column =
    Bridge.column(
      FreqSketchAggregate(Bridge.expression(item), k).toAggregateExpression())
}
