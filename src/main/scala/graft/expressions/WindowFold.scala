package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `n`-window polynomial folds of a token-hash array, sorted and
  * deduplicated, in ONE compiled pass:
  * `out_i = fold(th[i..i+n-1], 0)((a, h) => (a·31 + h) mod P)` — the hashed
  * n-gram shingle set of a document whose tokens were hashed once upstream.
  *
  * Exists because both interpreted formulations lose badly on the explode
  * path (round-4 profile, 178k windows at sf0.1): building the window
  * STRING and re-char-hashing it cost O(n · token_len) per window
  * (~17 s), and an unrolled arithmetic fold in a higher-order lambda paid
  * ~4n boxed Expression.eval calls per window (~40 s). This expression is
  * one eval per DOCUMENT — a nested primitive loop plus one sort.
  *
  * Input elements must be non-null (token hashes of a split() array are).
  * Mirrors [[graft.functions.Hashing.windowFoldDuck]], the oracle dialect
  * of the same recurrence. */
case class WindowFold(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "window width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_fold"

  override def nullSafeEval(a: Any): Any =
    WindowFold.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.WindowFold.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowFold {

  /** Sorted distinct window folds; empty when fewer than `n` elements (the
    * expression is total — no caller-side length guard needed). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val m = len - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 31 + arr.getLong(i + j)) % graft.functions.Hashing.P
        j += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var k = 0
    var t = 1
    while (t < m) {
      if (out(t) != out(k)) { k += 1; out(k) = out(t) }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k + 1))
  }

  /** Column-API entry: hashed n-gram shingle set from a token-hash array. */
  def windowFold(c: Column, n: Int): Column =
    Bridge.column(WindowFold(Bridge.expression(c), n))

  /** Column-API entry: POSITIONAL window folds ([[WindowFoldPos]]). */
  def windowFoldPos(c: Column, n: Int): Column =
    Bridge.column(WindowFoldPos(Bridge.expression(c), n))
}

/** The POSITIONAL sibling of [[WindowFold]]: every `n`-window fold in
  * document order, NOT sorted, NOT deduplicated — `out_i` is the hash of
  * the window starting at token i (0-based). The set form answers "is this
  * document contaminated"; this form answers "WHERE" — the surgical
  * decontamination op maps each matched hash back to the token span it
  * covers. Same compiled per-WINDOW fold (each window rehashed in full —
  * O(n·len), the right cost at n=5; the modular hash has no cheap rolling
  * inverse, so a rolling recurrence is not carried over), mirrored by
  * [[graft.functions.Hashing.windowFoldPosDuck]]. */
case class WindowFoldPos(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "window width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_fold_pos"

  override def nullSafeEval(a: Any): Any =
    WindowFoldPos.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.WindowFoldPos.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowFoldPos {

  /** Positional window folds; empty when fewer than `n` elements. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val m = len - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 31 + arr.getLong(i + j)) % graft.functions.Hashing.P
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
