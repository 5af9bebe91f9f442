package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass local-level Kalman filter over a numeric array — the
  * steady-state smoother next to [[HoltFold]] (which assumes a linear
  * trend) for series that are level + noise. Process variance `q`,
  * observation variance `r`; per step:
  * `p' = p + q; k = p'/(p'+r); l += (v−l)·k; p = (1−k)·p'`,
  * seeded `l₀ = v₀, p₀ = 1`. Returns `array(level, p, gain)` after
  * the final element (gain = the last k, which converges to the
  * steady-state Kalman gain).
  *
  * Arithmetic is parenthesized exactly as the DuckDB recursive-CTE
  * oracle spells it (k recomputed inline in each update — identical
  * IEEE value), with `q`/`r` interpolated via Double.toString
  * (round-trips bit-exact). NULL elements are SKIPPED; empty /
  * all-null arrays yield NULL. (Reference domain: smoothing the
  * noisy per-customer balance series before trend extraction,
  * src/demo/utils.py:355-419.)
  */
case class KalmanFold(child: Expression, q: Double, r: Double)
    extends UnaryExpression {
  require(java.lang.Double.isFinite(q) && java.lang.Double.isFinite(r) &&
    q >= 0 && r > 0, s"graft_kalman: need q >= 0 and r > 0, got $q/$r")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var seeded = false
    var l = 0.0
    var p = 0.0
    var k = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = VectorExprs.elemAt(child, arr, i)
        if (!seeded) { l = x; p = 1.0; k = 0.0; seeded = true }
        else {
          val pp = p + q
          k = pp / (pp + r)
          l = l + (x - l) * k
          p = (1.0 - k) * pp
        }
      }
      i += 1
    }
    if (!seeded) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(l, p, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val seeded = ctx.freshName("seeded")
      val l = ctx.freshName("l")
      val p = ctx.freshName("p")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val pp = ctx.freshName("pp")
      val qLit = java.lang.Double.toString(q)
      val rLit = java.lang.Double.toString(r)
      s"""
         |int $n = $a.numElements();
         |boolean $seeded = false;
         |double $l = 0.0;
         |double $p = 0.0;
         |double $k = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = ${VectorExprs.elemGetter(child, a, i)};
         |    if (!$seeded) { $l = $x; $p = 1.0; $k = 0.0; $seeded = true; }
         |    else {
         |      double $pp = $p + ${qLit}D;
         |      $k = $pp / ($pp + ${rLit}D);
         |      $l = $l + ($x - $l) * $k;
         |      $p = (1.0 - $k) * $pp;
         |    }
         |  }
         |}
         |if (!$seeded) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new double[]{$l, $p, $k});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KalmanFold =
    copy(child = newChild)
}
