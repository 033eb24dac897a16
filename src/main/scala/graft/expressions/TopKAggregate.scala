package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs, ordered
  * score DESC then id ASC (a total, deterministic order).
  *
  * This is the scalable form of "top-k per group": a window
  * `row_number() <= k` must sort EVERY row of every partition; this
  * aggregate's partial buffers cap at k entries, so map-side combine ships
  * at most k rows per (group × input partition) into the shuffle — the
  * difference between shuffling |T| and |groups|·k at 100 TB.
  *
  * A `TypedImperativeAggregate` (the engine-internal aggregate contract with
  * explicit partial-buffer serialization), exercised beside the codegen
  * expressions as the third custom-Catalyst surface.
  */
case class TopKAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (double, bigint), got ($s, $i)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  // Min-heap on the KEPT order (score desc, id asc ⇒ root = currently-worst
  // kept entry): evict the root when a better pair arrives.
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val worst = buf.head
      if (s > worst._1 || (s == worst._1 && i < worst._2)) {
        buf.dequeue(); buf.enqueue((s, i))
      }
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) offer(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => offer(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggregate {
  /** Column-API entry: top-k (score desc, id asc) pairs per group. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAggregate(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
