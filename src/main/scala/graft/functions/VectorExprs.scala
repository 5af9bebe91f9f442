package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native vector expressions for the embedding-similarity operators.
  *
  * Why not flat scalar columns or higher-order functions: a 64-dim dot
  * product written as 64 column products compiles to a ~130-column
  * expression tree per join side — multi-second codegen per query and
  * MiB-scale task binaries (round-1 bench: ann_lsh spent >6s mostly in
  * plan compile). A single codegen'd loop over the serialized array is
  * the same arithmetic with a constant-size plan: identical results
  * (left-to-right IEEE accumulation, floats widened to double exactly
  * like `CAST(embedding AS DOUBLE[])`), ~100× smaller codegen.
  *
  * At 100 TB the constant-size plan also matters for the driver: plan
  * size is independent of embedding dimension.
  */
object VectorExprs {

  private[functions] def elemGetter(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }

  private[functions] def elemAt(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  /** Register all graft SQL functions on a session (idempotent — a
    * re-register would WARN on every operator construction).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    put("graft_simhash", exprs => SimHash64(exprs.head))
    put("graft_vec_dot", exprs => VecDot(exprs(0), exprs(1)))
    put("graft_lsh_bucket", exprs => LshBucket(exprs(0),
      exprs(1).eval().asInstanceOf[Number].intValue()))
    put("graft_minhash", exprs => MinHashSig(exprs(0),
      exprs(1).eval().asInstanceOf[Number].intValue()))
  }
}

/** Dot product of two numeric arrays (float or double elements), as one
  * sequential left-to-right accumulation — bit-identical to the
  * equivalent `a[0]*b[0] + a[1]*b[1] + …` column expression and to
  * DuckDB's list arithmetic on `DOUBLE[]`. Null elements contribute 0.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += VectorExprs.elemAt(left, x, i) * VectorExprs.elemAt(right, y, i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${VectorExprs.elemGetter(left, a, i)} * ${VectorExprs.elemGetter(right, b, i)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id: bit `p` of the result is set iff
  * the projection of the vector on md5-derived plane `p` is > 0
  * (weights = [[graft.operators.Similarity.planeWeight]], the same
  * literals the DuckDB oracle embeds — signs are bit-exact, see
  * OracleSql.annLsh). One loop, constant-size plan, vs the
  * `nPlanes × dim`-term column expression it replaces.
  */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  // weights indexed [plane][dim]; sized to the corpus dim at first use
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(nPlanes, LshBucket.MAX_DIM)((p, d) =>
      graft.operators.Similarity.planeWeight(p, d))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), LshBucket.MAX_DIM)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val w = weights(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d)) proj += VectorExprs.elemAt(child, arr, d) * w(d)
        d += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("lshWeights", weights, "double[][]")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      val w = ctx.freshName("w")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${LshBucket.MAX_DIM});
         |long $bucket = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double[] $w = $wRef[$p];
         |  double $proj = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$a.isNullAt($d)) {
         |      $proj += ${VectorExprs.elemGetter(child, a, d)} * $w[$d];
         |    }
         |  }
         |  if ($proj > 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Plane weights are materialized up to this many dimensions. */
  val MAX_DIM = 64
}
