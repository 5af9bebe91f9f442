package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Damped-trend Holt smoothing (Gardner & McKenzie 1985) over a
  * numeric array — [[HoltFold]]'s recursion with the trend damped by
  * φ each step:
  * `l₀ = v₀, b₀ = 0; lₜ = α·vₜ + (1−α)·(l + b·φ); bₜ = β·(lₜ−l) + (1−β)·b·φ`
  * returning `array(level, trend)` after the final element. The
  * damping is what makes long-horizon forecasts sane: plain Holt
  * extrapolates the last trend FOREVER (a two-week uptick projects
  * to infinity), damped trend flattens toward `l + b·φ(1−φʰ)/(1−φ)`
  * — the M-competition default for trend methods.
  *
  * Arithmetic is parenthesized exactly as the oracle's recursive CTE
  * (`x*α + (l + b·φ)·(1−α)`; `(lNew−l)·β + b·φ·(1−β)`), with
  * `1−α`/`1−β` precomputed — bit-identical to the interpolated SQL
  * literals (Double.toString round-trips). NULL elements are SKIPPED;
  * empty / all-null arrays yield NULL.
  */
case class DampedHoltFold(child: Expression, alpha: Double, beta: Double,
                          phi: Double) extends UnaryExpression {
  require(java.lang.Double.isFinite(alpha) && java.lang.Double.isFinite(beta) &&
    java.lang.Double.isFinite(phi),
    s"graft_holt_damped: alpha/beta/phi must be finite, got $alpha/$beta/$phi")

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
          val lNew = x * alpha + (l + b * phi) * ia
          b = (lNew - l) * beta + b * phi * ib
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
      val pLit = java.lang.Double.toString(phi)
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
         |      double $lNew = $x * ${aLit}D + ($l + $b * ${pLit}D) * ${iaLit}D;
         |      $b = ($lNew - $l) * ${bLit}D + $b * ${pLit}D * ${ibLit}D;
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

  override protected def withNewChildInternal(newChild: Expression): DampedHoltFold =
    copy(child = newChild)
}
