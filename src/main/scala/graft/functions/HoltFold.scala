package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Holt double-exponential smoothing over a numeric array — the
  * level/trend recursion
  * `l₀ = v₀, b₀ = 0; lₜ = α·vₜ + (1−α)·(l+b); bₜ = β·(lₜ−l) + (1−β)·b`
  * returning `array(level, trend)` after the final element. The
  * classic linear-trend forecast baseline (forecast@h = level +
  * h·trend) next to [[EwmaFold]]'s single-smoothing, one codegen'd
  * pass per series (reference domain: per-customer balance
  * forecasting, src/demo/utils.py:463-523's trend extrapolation).
  *
  * Arithmetic is parenthesized exactly as the DuckDB recursive-CTE
  * oracle spells it (`x*α + (l+b)·(1−α)`; `(lNew−l)·β + b·(1−β)`),
  * with `1−α`/`1−β` computed once in Scala — bit-identical to the
  * interpolated SQL literals (Double.toString round-trips).
  *
  * NULL elements are SKIPPED (a missing day does not reset the
  * recursion); empty / all-null arrays yield NULL.
  */
case class HoltFold(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression {
  require(java.lang.Double.isFinite(alpha) && java.lang.Double.isFinite(beta),
    s"graft_holt: alpha/beta must be finite, got $alpha/$beta")

  private val ia = 1.0 - alpha
  private val ib = 1.0 - beta

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // NULL for empty / all-null input even on a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var seeded = false
    var l = 0.0
    var b = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = VectorExprs.elemAt(child, arr, i)
        if (!seeded) { l = x; b = 0.0; seeded = true }
        else {
          val lNew = x * alpha + (l + b) * ia
          b = (lNew - l) * beta + b * ib
          l = lNew
        }
      }
      i += 1
    }
    if (!seeded) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(l, b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val seeded = ctx.freshName("seeded")
      val l = ctx.freshName("l")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val lNew = ctx.freshName("lNew")
      val aLit = java.lang.Double.toString(alpha)
      val iaLit = java.lang.Double.toString(ia)
      val bLit = java.lang.Double.toString(beta)
      val ibLit = java.lang.Double.toString(ib)
      s"""
         |int $n = $a.numElements();
         |boolean $seeded = false;
         |double $l = 0.0;
         |double $b = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = ${VectorExprs.elemGetter(child, a, i)};
         |    if (!$seeded) { $l = $x; $b = 0.0; $seeded = true; }
         |    else {
         |      double $lNew = $x * ${aLit}D + ($l + $b) * ${iaLit}D;
         |      $b = ($lNew - $l) * ${bLit}D + $b * ${ibLit}D;
         |      $l = $lNew;
         |    }
         |  }
         |}
         |if (!$seeded) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new double[]{$l, $b});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HoltFold =
    copy(child = newChild)
}
