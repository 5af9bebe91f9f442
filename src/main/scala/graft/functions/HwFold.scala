package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Additive Holt-Winters triple-exponential smoothing over a numeric
  * array — the seasonal sequel to [[HoltFold]] (reference domain:
  * period-30.5d seasonal balance series,
  * src/demo/create_time_series.py:110-139). State is (level, trend,
  * m seasonals); per element t (0-based among non-null values, j = t
  * mod m):
  *
  *   lNew  = (vₜ − sⱼ)·α + (l + b)·(1−α)
  *   b     = (lNew − l)·β + b·(1−β)
  *   sⱼ    = (vₜ − lNew)·γ + sⱼ·(1−γ)
  *   l     = lNew
  *
  * seeded at t = 0 with l = v₀, b = 0, s = 0⃗ (no seasonal update on
  * the seed element — the [[HoltFold]] seed convention extended).
  * Returns `array(level, trend, count, s₀ … s₍ₘ₋₁₎)` after the final
  * element — `count` (the number of folded values) lets the caller
  * pick the right seasonal for an h-step forecast:
  * `level + h·trend + s[(count−1+h) mod m]`.
  *
  * Arithmetic is parenthesized exactly as the DuckDB recursive-CTE
  * oracle spells it (lNew inlined into the b and s updates recomputes
  * the identical IEEE value), with `1−α`/`1−β`/`1−γ` computed once in
  * Scala — bit-identical to the interpolated SQL literals.
  *
  * NULL elements are SKIPPED without advancing the seasonal position
  * (a missing day does not reset the recursion); empty / all-null
  * arrays yield NULL.
  */
case class HwFold(child: Expression, alpha: Double, beta: Double,
                  gamma: Double, period: Int)
    extends UnaryExpression {
  require(java.lang.Double.isFinite(alpha) && java.lang.Double.isFinite(beta) &&
    java.lang.Double.isFinite(gamma),
    s"graft_holt_winters: alpha/beta/gamma must be finite, got $alpha/$beta/$gamma")
  require(period >= 2, s"graft_holt_winters: period must be >= 2, got $period")

  private val ia = 1.0 - alpha
  private val ib = 1.0 - beta
  private val ig = 1.0 - gamma

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // NULL for empty / all-null input even on a non-nullable child
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var t = 0
    var l = 0.0
    var b = 0.0
    val s = new Array[Double](period)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = VectorExprs.elemAt(child, arr, i)
        if (t == 0) { l = x; b = 0.0 }
        else {
          val j = t % period
          val lNew = (x - s(j)) * alpha + (l + b) * ia
          b = (lNew - l) * beta + b * ib
          s(j) = (x - lNew) * gamma + s(j) * ig
          l = lNew
        }
        t += 1
      }
      i += 1
    }
    if (t == 0) null
    else {
      val out = new Array[Double](3 + period)
      out(0) = l; out(1) = b; out(2) = t.toDouble
      System.arraycopy(s, 0, out, 3, period)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val l = ctx.freshName("l")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val lNew = ctx.freshName("lNew")
      val out = ctx.freshName("out")
      val aLit = java.lang.Double.toString(alpha)
      val iaLit = java.lang.Double.toString(ia)
      val bLit = java.lang.Double.toString(beta)
      val ibLit = java.lang.Double.toString(ib)
      val gLit = java.lang.Double.toString(gamma)
      val igLit = java.lang.Double.toString(ig)
      s"""
         |int $n = $a.numElements();
         |int $t = 0;
         |double $l = 0.0;
         |double $b = 0.0;
         |double[] $s = new double[$period];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = ${VectorExprs.elemGetter(child, a, i)};
         |    if ($t == 0) { $l = $x; $b = 0.0; }
         |    else {
         |      int $j = $t % $period;
         |      double $lNew = ($x - $s[$j]) * ${aLit}D + ($l + $b) * ${iaLit}D;
         |      $b = ($lNew - $l) * ${bLit}D + $b * ${ibLit}D;
         |      $s[$j] = ($x - $lNew) * ${gLit}D + $s[$j] * ${igLit}D;
         |      $l = $lNew;
         |    }
         |    $t++;
         |  }
         |}
         |if ($t == 0) { ${ev.isNull} = true; }
         |else {
         |  double[] $out = new double[${3 + period}];
         |  $out[0] = $l; $out[1] = $b; $out[2] = (double) $t;
         |  System.arraycopy($s, 0, $out, 3, $period);
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HwFold =
    copy(child = newChild)
}
