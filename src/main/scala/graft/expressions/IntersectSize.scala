package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| for two SORTED, DISTINCT `array<bigint>` columns, by two-pointer
  * merge — the hot inner loop of exact-Jaccard dedup verification.
  *
  * `array_intersect` builds a hash set per invocation; over millions of
  * candidate pairs that dominates the query. The merge over pre-sorted
  * primitive longs is branch-cheap, allocation-free, and whole-stage
  * codegen'd. Callers sort once per document (|D| sorts), not per pair.
  *
  * Result equals `size(array_intersect(a, b))` exactly when both inputs are
  * sorted ascending and duplicate-free (as [[graft.ops.Dedup.hashedShingleSets]]
  * produces); the DuckDB oracle keeps using `len(list_intersect(...))`.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  final long $xi = $a.getLong($i);
         |  final long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  /** Column-API entry point; inputs must be sorted ascending and distinct. */
  def intersectSize(a: Column, b: Column): Column =
    Bridge.column(IntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
