package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram statistics over a token array:
  * `struct(ngrams, n_distinct, top_run)` where `ngrams` = number of
  * n-grams (max(0, len-n+1)), `n_distinct` = distinct n-grams
  * (space-joined, exact string equality), and `top_run` = the highest
  * single-token occurrence count (longest equal run of the sorted
  * copy — sort order is irrelevant to run grouping).
  *
  * This is the scale path for
  * [[graft.operators.TextOps.repetition]] /
  * [[graft.operators.TextOps.compositeFilter]], which otherwise
  * evaluate THREE separate interpreted HOF trees per row (a
  * `transform` building the gram array for `size`, a second identical
  * `transform` under `array_distinct`, and an `aggregate` fold for the
  * top run — each allocating intermediate arrays per row).
  * `CodegenFallback` like [[SimHash64]]: the hash-set makes doGenCode
  * awkward, and the win is the single primitive-loop pass, not
  * codegen fusion.
  *
  * Tokens must be non-null (they come from `split`, which never
  * yields null elements). A null element is REJECTED with a named
  * error rather than coerced: the registered SQL function is callable
  * on arbitrary arrays, and for null elements the documented
  * HOF equivalence breaks silently — this join always inserts the
  * separator, while `concat_ws` SKIPS nulls (ADVICE r7).
  */
case class NgramStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("ngrams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_run", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_ngram_stats: null array element at position $i — tokens must be " +
            "non-null (split() output is; for arbitrary arrays filter nulls first). " +
            "The HOF formulation's concat_ws silently SKIPS nulls, so the documented " +
            "equivalence cannot hold on null-bearing input.")
      toks(i) = arr.get(i, StringType).asInstanceOf[UTF8String].toString
      i += 1
    }
    val ngrams = math.max(0, m - n + 1)
    val seen = new java.util.HashSet[String](math.max(16, ngrams * 2))
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < ngrams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    var topRun = 0
    if (m > 0) {
      val sorted = toks.clone()
      java.util.Arrays.sort(sorted, java.util.Comparator.naturalOrder[String]())
      var run = 1
      topRun = 1
      i = 1
      while (i < m) {
        if (sorted(i) == sorted(i - 1)) { run += 1; if (run > topRun) topRun = run }
        else run = 1
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](ngrams, seen.size, topRun))
  }

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}
