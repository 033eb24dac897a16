package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst squared-L2 distance over two numeric array columns —
  * the k-means/PQ hot scalar, promoted from the higher-order-function form
  * exactly as [[DotProduct]] was (SURVEY §7.3: "start expression-SQL,
  * promote to `Expression` if bench demands").
  *
  * The HOF form it replaces,
  * `aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS
  * DOUBLE)) * (...)), 0.0D, (acc, v) -> acc + v)`, is CodegenFallback:
  * every ROW pays interpreted lambda dispatch per element plus an
  * intermediate array allocation — and it sits on the highest-volume rows
  * the engine produces (the n·k candidate rows of every nearest-centroid
  * assignment, the n·m·k rows of PQ codebook training/encode). This
  * expression participates in whole-stage codegen: one bulk copy per array,
  * a tight primitive loop, no boxing.
  *
  * Determinism contract: widens each element to double, accumulates
  * `(x - y)²` left-to-right in index order — the exact IEEE sequence of the
  * zip_with/aggregate fold (and of DuckDB's `list_reduce` replay), so every
  * distance, every argmin tie, and every downstream hash stay bit-identical
  * to the conformance oracle. Length semantics follow [[DotProduct]]
  * (fold over the shorter array); all call sites pair equal-dims arrays.
  *
  * Accepts `array<float>` or `array<double>` on each side independently
  * (corpus vectors are float32; centroid tables are double). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> on both sides, " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"

  private def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  private def toDoubles(a: Any, float: Boolean): Array[Double] =
    if (float) {
      val f = a.asInstanceOf[ArrayData].toFloatArray()
      val d = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
      d
    } else a.asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = toDoubles(a, isFloat(left.dataType))
    val y = toDoubles(b, isFloat(right.dataType))
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x(i) - y(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def extract(src: String, float: Boolean, out: String): String =
        if (float) {
          val f = ctx.freshName("f")
          val j = ctx.freshName("j")
          s"""
             |final float[] $f = $src.toFloatArray();
             |final double[] $out = new double[$f.length];
             |for (int $j = 0; $j < $f.length; $j++) { $out[$j] = (double) $f[$j]; }
           """.stripMargin
        } else s"final double[] $out = $src.toDoubleArray();"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val xa = ctx.freshName("xa")
      val ya = ctx.freshName("ya")
      s"""
         |${extract(a, isFloat(left.dataType), xa)}
         |${extract(b, isFloat(right.dataType), ya)}
         |final int $n = java.lang.Math.min($xa.length, $ya.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $xa[$i] - $ya[$i];
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Column-API entry point: `sqDist(a, b)` — Σ (aᵢ − bᵢ)², left-to-right. */
  def sqDist(a: Column, b: Column): Column =
    Bridge.column(SqDist(Bridge.expression(a), Bridge.expression(b)))
}
