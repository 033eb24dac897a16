package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded Levenshtein distance with cutoff: returns `min(dist(a, b), k+1)`.
  *
  * The built-in `levenshtein(a, b)` fills the full O(n·m) DP table; pair
  * mining ([[graft.ops.Dedup.editDistancePairs]]) only ever asks "is the
  * distance ≤ k" for small k, where the classic banded evaluation (Ukkonen
  * 1985) answers in O(min(n,m)·k): cells farther than k off the diagonal
  * can never reach a ≤ k path, so only a 2k+1-wide band is computed, and
  * the scan aborts the moment a whole band row exceeds k. At a verify stage
  * processing millions of candidate pairs, the asymptotic drop is the
  * difference between the distance pass dominating the stage or not.
  *
  * Distance semantics match `levenshtein` (and DuckDB's) for the ≤ k range
  * exactly; k+1 is a saturation marker, not a distance.
  */
case class BoundedLevenshtein(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0, s"bound must be non-negative, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lev_bounded"

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.BoundedLevenshtein.compute($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Column-API entry point: `min(levenshtein(a, b), k+1)` in O(len·k). */
  def boundedLev(a: Column, b: Column, k: Int): Column =
    Bridge.column(
      BoundedLevenshtein(Bridge.expression(a), Bridge.expression(b), k))

  /** Banded two-row DP. Called from both interpreted eval and generated
    * code (scalac emits a static forwarder for this method on the
    * companion class, so the codegen call site is plain Java). */
  def compute(la: UTF8String, lb: UTF8String, k: Int): Int = {
    // Char-level distance, same unit the built-in and DuckDB count in.
    var s = la.toString
    var t = lb.toString
    if (s.length > t.length) { val tmp = s; s = t; t = tmp }
    val n = s.length
    val m = t.length
    if (m - n > k) return k + 1
    if (n == 0) return math.min(m, k + 1)

    // prev(j) = dist(s[0,i), t[0,j)) for the previous row, within the band.
    // Rows swap buffers; the band shifts right by at most one cell per row,
    // so every cell the next row reads was written by the row before it.
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      // Left neighbour of the band's first cell: column 0 means "first i
      // chars of s deleted" and costs i when it is still inside the band;
      // only once the band has moved past column 0 is it truly unreachable.
      cur(lo - 1) = if (lo == 1) math.min(i, inf) else inf
      var rowMin = inf
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var d = math.min(sub, math.min(del, ins))
        if (d > inf) d = inf
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (rowMin >= inf) return inf // whole band saturated — can't recover
      if (hi < m) cur(hi + 1) = inf // right neighbour for the next row
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), inf)
  }
}
