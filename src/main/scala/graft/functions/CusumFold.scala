package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One-pass two-sided CUSUM drift detector over a standardized numeric
  * array (Page 1954 — the sequential changepoint chart next to
  * [[graft.operators.TimeSeries.changepoint]]'s single retrospective
  * shift). Per element z (a pre-rounded z-score):
  *
  * {{{
  * s⁺ = max(0, s⁺ + z − k)      s⁻ = min(0, s⁻ + z + k)
  * alarm when s⁺ > h or s⁻ < −h → count it, record the first index,
  *                                reset both sides to 0
  * }}}
  *
  * Returns `array(nAlarms, firstIdx, maxS⁺, minS⁻)` (firstIdx 1-based
  * over non-null elements, −1 when no alarm). The running extrema are
  * taken BEFORE any reset, so they report the worst excursion even
  * when it alarmed. max/min/+/− are exact IEEE ops applied in the same
  * order as the DuckDB recursive-CTE oracle, so the trajectory is
  * engine-reproducible; `k`/`h` interpolate via Double.toString
  * (round-trips bit-exact). NULL elements are skipped; empty/all-null
  * arrays yield NULL. (Reference domain: the injected level-shift
  * spikes of create_time_series.py:147 are exactly what a CUSUM chart
  * alarms on.)
  */
case class CusumFold(child: Expression, k: Double, h: Double)
    extends UnaryExpression {
  require(java.lang.Double.isFinite(k) && java.lang.Double.isFinite(h) &&
    k >= 0 && h > 0, s"graft_cusum: need k >= 0 and h > 0, got $k/$h")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sp = 0.0; var sn = 0.0
    var msp = 0.0; var msn = 0.0
    var nal = 0L; var first = -1L
    var idx = 0L
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val z = VectorExprs.elemAt(child, arr, i)
        any = true
        idx += 1
        sp = math.max(0.0, sp + z - k)
        sn = math.min(0.0, sn + z + k)
        if (sp > msp) msp = sp
        if (sn < msn) msn = sn
        if (sp > h || sn < -h) {
          nal += 1
          if (first < 0) first = idx
          sp = 0.0; sn = 0.0
        }
      }
      i += 1
    }
    if (!any) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(nal.toDouble, first.toDouble, msp, msn))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sp = ctx.freshName("sp")
      val sn = ctx.freshName("sn")
      val msp = ctx.freshName("msp")
      val msn = ctx.freshName("msn")
      val nal = ctx.freshName("nal")
      val first = ctx.freshName("first")
      val idx = ctx.freshName("idx")
      val any = ctx.freshName("any")
      val z = ctx.freshName("z")
      val kLit = java.lang.Double.toString(k)
      val hLit = java.lang.Double.toString(h)
      s"""
         |int $n = $a.numElements();
         |double $sp = 0.0; double $sn = 0.0;
         |double $msp = 0.0; double $msn = 0.0;
         |long $nal = 0L; long $first = -1L; long $idx = 0L;
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $z = ${VectorExprs.elemGetter(child, a, i)};
         |    $any = true;
         |    $idx++;
         |    $sp = Math.max(0.0, $sp + $z - ${kLit}D);
         |    $sn = Math.min(0.0, $sn + $z + ${kLit}D);
         |    if ($sp > $msp) $msp = $sp;
         |    if ($sn < $msn) $msn = $sn;
         |    if ($sp > ${hLit}D || $sn < -${hLit}D) {
         |      $nal++;
         |      if ($first < 0) $first = $idx;
         |      $sp = 0.0; $sn = 0.0;
         |    }
         |  }
         |}
         |if (!$any) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new double[]{(double) $nal, (double) $first, $msp, $msn});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CusumFold =
    copy(child = newChild)
}
