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

  /** Arity check with a message that names the function — an
    * IndexOutOfBounds from the builder would not.
    */
  private[graft] def requireArity(fn: String, usage: String,
                                  exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${exprs.length}; usage: $usage")

  /** Extract a literal (foldable) integer argument, failing with the
    * function name and signature — eval() on a non-foldable column
    * reference would throw an opaque unresolved-expression error, and
    * a string literal an unexplained ClassCastException.
    */
  private[graft] def litIntArg(fn: String, usage: String,
                               exprs: Seq[Expression], i: Int): Int = {
    val e = exprs(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal integer (got a non-constant " +
          s"expression); usage: $usage")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal integer, got '$other'; usage: $usage")
    }
  }

  /** Extract a literal (foldable) double argument — accepts integer,
    * double, and decimal literals (a bare SQL `0.3` parses as DECIMAL).
    */
  private[graft] def litDoubleArg(fn: String, usage: String,
                                  exprs: Seq[Expression], i: Int): Double = {
    val e = exprs(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal number (got a non-constant " +
          s"expression); usage: $usage")
    e.eval() match {
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal number, got '$other'; usage: $usage")
    }
  }

  /** Extract a literal (foldable) string argument. */
  private[graft] def litStrArg(fn: String, usage: String,
                               exprs: Seq[Expression], i: Int): String = {
    val e = exprs(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal string (got a non-constant " +
          s"expression); usage: $usage")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal string, got '$other'; usage: $usage")
    }
  }

  private[graft] val USAGE: Map[String, String] = Map(
    "graft_simhash" -> "graft_simhash(tokens: array<string>)",
    "graft_vec_dot" -> "graft_vec_dot(a: array<float|double>, b: array<float|double>)",
    "graft_lsh_bucket" -> "graft_lsh_bucket(v: array<float|double>, nPlanes: int literal)",
    "graft_minhash" -> "graft_minhash(shingles: array<string>, perms: int literal)",
    "graft_rolling_hash" -> "graft_rolling_hash(text: string)",
    "graft_winnow" -> "graft_winnow(text: string, k: int literal, w: int literal)",
    "graft_ngram_stats" -> "graft_ngram_stats(tokens: array<string> with NON-NULL elements, n: int literal)",
    "graft_ewma" -> "graft_ewma(vals: array<float|double>, alpha: double literal)",
    "graft_holt" -> "graft_holt(vals: array<float|double>, alpha: double literal, beta: double literal)",
    "graft_holt_damped" -> "graft_holt_damped(vals: array<float|double>, alpha: double literal, beta: double literal, phi: double literal)",
    "graft_holt_winters" -> "graft_holt_winters(vals: array<float|double>, alpha: double literal, beta: double literal, gamma: double literal, period: int literal)",
    "graft_kalman" -> "graft_kalman(vals: array<float|double>, q: double literal, r: double literal)",
    "graft_cusum" -> "graft_cusum(zvals: array<float|double>, k: double literal, h: double literal)",
    "graft_ivf_cell" -> "graft_ivf_cell(v: array<float|double>, centroids: string literal from IvfCell.encode)",
    "graft_pq_codes" -> "graft_pq_codes(v: array<float|double>, codebook: string literal from PqCodes.encode)",
    "graft_ivf_cells" -> "graft_ivf_cells(v: array<float|double>, centroids: string literal from IvfCell.encode, nprobe: int literal)",
    "graft_bpe_apply" -> "graft_bpe_apply(w: string, merges: string literal from BpeApply.encode)",
    "graft_ulm_viterbi" -> "graft_ulm_viterbi(w: string, vocab: string literal from UlmViterbi.encode)",
    "graft_wordpiece_apply" -> "graft_wordpiece_apply(w: string, vocab: string literal from WordPieceApply.encode, maxInputChars: int literal)",
    "graft_householder_chain" -> "graft_householder_chain(v: array<float|double>, us: string literal from HouseholderChain.encode)")

  private[graft] def build(name: String, exprs: Seq[Expression]): Expression = {
    val usage = USAGE(name)
    name match {
      case "graft_simhash" =>
        requireArity(name, usage, exprs, 1); SimHash64(exprs.head)
      case "graft_vec_dot" =>
        requireArity(name, usage, exprs, 2); VecDot(exprs(0), exprs(1))
      case "graft_lsh_bucket" =>
        requireArity(name, usage, exprs, 2)
        LshBucket(exprs(0), litIntArg(name, usage, exprs, 1))
      case "graft_minhash" =>
        requireArity(name, usage, exprs, 2)
        MinHashSig(exprs(0), litIntArg(name, usage, exprs, 1))
      case "graft_rolling_hash" =>
        requireArity(name, usage, exprs, 1); RollingHash31(exprs.head)
      case "graft_winnow" =>
        requireArity(name, usage, exprs, 3)
        WinnowFps(exprs(0), litIntArg(name, usage, exprs, 1),
          litIntArg(name, usage, exprs, 2))
      case "graft_ngram_stats" =>
        requireArity(name, usage, exprs, 2)
        NgramStats(exprs(0), litIntArg(name, usage, exprs, 1))
      case "graft_ewma" =>
        requireArity(name, usage, exprs, 2)
        EwmaFold(exprs(0), litDoubleArg(name, usage, exprs, 1))
      case "graft_holt" =>
        requireArity(name, usage, exprs, 3)
        HoltFold(exprs(0), litDoubleArg(name, usage, exprs, 1),
          litDoubleArg(name, usage, exprs, 2))
      case "graft_holt_damped" =>
        requireArity(name, usage, exprs, 4)
        DampedHoltFold(exprs(0), litDoubleArg(name, usage, exprs, 1),
          litDoubleArg(name, usage, exprs, 2), litDoubleArg(name, usage, exprs, 3))
      case "graft_holt_winters" =>
        requireArity(name, usage, exprs, 5)
        HwFold(exprs(0), litDoubleArg(name, usage, exprs, 1),
          litDoubleArg(name, usage, exprs, 2), litDoubleArg(name, usage, exprs, 3),
          litIntArg(name, usage, exprs, 4))
      case "graft_kalman" =>
        requireArity(name, usage, exprs, 3)
        KalmanFold(exprs(0), litDoubleArg(name, usage, exprs, 1),
          litDoubleArg(name, usage, exprs, 2))
      case "graft_cusum" =>
        requireArity(name, usage, exprs, 3)
        CusumFold(exprs(0), litDoubleArg(name, usage, exprs, 1),
          litDoubleArg(name, usage, exprs, 2))
      case "graft_ivf_cell" =>
        requireArity(name, usage, exprs, 2)
        IvfCell(exprs(0), litStrArg(name, usage, exprs, 1))
      case "graft_pq_codes" =>
        requireArity(name, usage, exprs, 2)
        PqCodes(exprs(0), litStrArg(name, usage, exprs, 1))
      case "graft_ivf_cells" =>
        requireArity(name, usage, exprs, 3)
        IvfCells(exprs(0), litStrArg(name, usage, exprs, 1),
          litIntArg(name, usage, exprs, 2))
      case "graft_bpe_apply" =>
        requireArity(name, usage, exprs, 2)
        BpeApply(exprs(0), litStrArg(name, usage, exprs, 1))
      case "graft_ulm_viterbi" =>
        requireArity(name, usage, exprs, 2)
        UlmViterbi(exprs(0), litStrArg(name, usage, exprs, 1))
      case "graft_wordpiece_apply" =>
        requireArity(name, usage, exprs, 3)
        WordPieceApply(exprs(0), litStrArg(name, usage, exprs, 1),
          litIntArg(name, usage, exprs, 2))
      case "graft_householder_chain" =>
        requireArity(name, usage, exprs, 2)
        HouseholderChain(exprs(0), litStrArg(name, usage, exprs, 1))
    }
  }

  /** Register all graft SQL functions on a session (idempotent — a
    * re-register would WARN on every operator construction).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, build(name, _), "built-in")
    USAGE.keys.foreach(put)
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

  // weights indexed [plane][dim]; materialized to MAX_DIM — inputs
  // wider than that FAIL (see checkDim) rather than silently hashing
  // a truncated prefix, which would quietly degrade LSH recall and
  // diverge from an oracle computed at the real dimension.
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(nPlanes, LshBucket.MAX_DIM)((p, d) =>
      graft.operators.Similarity.planeWeight(p, d))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = LshBucket.checkDim(arr.numElements())
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
         |int $n = graft.functions.LshBucket.checkDim($a.numElements());
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

  /** Fail fast on vectors wider than the materialized weight table —
    * silently bucketing a 64-dim prefix of a wider embedding would
    * degrade recall with no error. Called from both interpreted eval
    * and generated code.
    */
  def checkDim(numElements: Int): Int = {
    if (numElements > MAX_DIM)
      throw new IllegalArgumentException(
        s"graft_lsh_bucket: embedding dim $numElements exceeds MAX_DIM=$MAX_DIM; " +
          "raise LshBucket.MAX_DIM to cover the corpus dimension")
    numElements
  }
}
