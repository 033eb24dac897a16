package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns.
  *
  * The hot scalar of the similarity/dedup operators (SURVEY.md §7.3 row
  * "vector similarity": "start UDF, promote to `Expression` if bench
  * demands" — bench demanded). Versus the higher-order-function formulation
  * (`aggregate(transform(sequence(...)))`) this participates in whole-stage
  * codegen: a tight primitive loop, no per-element lambda dispatch, no boxing.
  *
  * Determinism contract: accumulates left-to-right in double precision —
  * the exact order DuckDB's `list_reduce` folds — so cosine values remain
  * bit-identical to the conformance oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Bulk-copy to primitive arrays first: UnsafeArrayData.toFloatArray is one
  // Platform.copyMemory, and HotSpot auto-vectorizes the flat float[] loop,
  // neither of which per-element getFloat calls allow. Fold order (left to
  // right, double accumulator) is unchanged, so oracle bit-identity holds.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x(i).toDouble * y(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val xa = ctx.freshName("xa")
      val ya = ctx.freshName("ya")
      s"""
         |final float[] $xa = $a.toFloatArray();
         |final float[] $ya = $b.toFloatArray();
         |final int $n = java.lang.Math.min($xa.length, $ya.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $xa[$i]) * ((double) $ya[$i]);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
