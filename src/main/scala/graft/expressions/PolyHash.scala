package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash `fold(codes, 0)((a, c) => (a·31 + c) mod P)`
  * — the native form of [[graft.functions.Hashing.polyHashSpark]], for hot
  * paths hashing millions of shingles/tokens where the higher-order-function
  * formulation's per-character lambda dispatch dominates.
  *
  * Iterates UTF-8 BYTES; for ASCII input (the corpus — and anything the
  * oracle-checked queries hash) byte values equal the character codes the
  * SQL fragments (`ascii`/`unicode`) produce, so results are identical in
  * both dialects. Non-ASCII input would diverge from the SQL fragments —
  * callers on arbitrary text should pre-normalize or use the fragment form.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % graft.functions.Hashing.P
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val p = graft.functions.Hashing.P
      s"""
         |final byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31L + ($bytes[$i] & 0xff)) % ${p}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  def polyHash(c: Column): Column = Bridge.column(PolyHash(Bridge.expression(c)))
}
