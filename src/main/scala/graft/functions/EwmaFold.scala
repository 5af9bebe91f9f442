package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** One-pass exponentially-weighted moving average over a numeric array:
  * `acc₀ = v₀; accᵢ = acc·(1−α) + vᵢ·α`, returning the final value —
  * the codegen'd replacement for the interpreted `aggregate(...)` HOF
  * fold (reference exp-smoothing baseline; same lesson as
  * [[RollingHash31]]: HOF lambdas evaluate interpreted per element,
  * ~20× slower at 635-day × 10⁸-key scale).
  *
  * Null semantics replicate the HOF fold exactly (parity spec in
  * TimeSeriesSpec): the accumulator starts NULL, a NULL element
  * nullifies the running value, and the next non-null element reseeds
  * it; an empty or all-null array yields NULL.
  *
  * `beta = 1.0 − alpha` is computed once in Scala — bit-identical to
  * the `${1 - alpha}` literal the SQL/oracle formulations interpolate
  * (Double.toString round-trips exactly).
  */
case class EwmaFold(child: Expression, alpha: Double) extends UnaryExpression {
  require(java.lang.Double.isFinite(alpha),
    s"graft_ewma: alpha must be finite, got $alpha")

  private val beta = 1.0 - alpha

  override def dataType: DataType = DoubleType

  // NULL for empty / all-null / trailing-null arrays even when the
  // input column itself is non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var accNull = true
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xNull = arr.isNullAt(i)
      if (accNull) {
        if (!xNull) { acc = VectorExprs.elemAt(child, arr, i); accNull = false }
      } else if (xNull) {
        accNull = true
      } else {
        acc = acc * beta + VectorExprs.elemAt(child, arr, i) * alpha
      }
      i += 1
    }
    if (accNull) null else java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val accNull = ctx.freshName("accNull")
      val xNull = ctx.freshName("xNull")
      val aLit = java.lang.Double.toString(alpha)
      val bLit = java.lang.Double.toString(beta)
      s"""
         |int $n = $a.numElements();
         |boolean $accNull = true;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $xNull = $a.isNullAt($i);
         |  if ($accNull) {
         |    if (!$xNull) { $acc = ${VectorExprs.elemGetter(child, a, i)}; $accNull = false; }
         |  } else if ($xNull) {
         |    $accNull = true;
         |  } else {
         |    $acc = $acc * ${bLit}D + ${VectorExprs.elemGetter(child, a, i)} * ${aLit}D;
         |  }
         |}
         |if ($accNull) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EwmaFold =
    copy(child = newChild)
}
