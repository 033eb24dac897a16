package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) value of two int columns: sign-flip each to an unsigned
  * 32-bit code (so negatives order before positives), spread the bits, and
  * interleave — x in even positions, y in odd.
  *
  * The multi-dimensional clustering key the reference cannot express (its
  * only layouts are heap pages + single-key B-trees, SURVEY.md §2.1): sort a
  * table by this value at write time and BOTH dimensions end up clustered in
  * every file, so min/max (row-group / file) statistics prune 2-D box
  * predicates — the standard lakehouse layout for multi-column selective
  * scans at 100 TB, where a single-column sort only helps one predicate.
  */
case class ZOrderValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (int, int), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ZOrderValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderValue {
  /** Spread the low 32 bits of `v` into the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton-interleave two ints, order-preserving across negatives. */
  def interleave(x: Int, y: Int): Long =
    spread((x ^ Int.MinValue).toLong) | (spread((y ^ Int.MinValue).toLong) << 1)

  /** Column-API entry point: `zorder(x, y)`. */
  def zorder(x: Column, y: Column): Column =
    Bridge.column(ZOrderValue(Bridge.expression(x), Bridge.expression(y)))
}
