package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a LEARNED, ORDERED BPE merge list (Sennrich et al. 2016) to
  * one word: start from the word's codepoints, then for each merge
  * `(a, b)` in rank order replace adjacent `(a, b)` symbol pairs with
  * `a+b`, greedily left-to-right and non-overlapping — EXACTLY the
  * trainer's per-round replay, which is what guarantees that encoding
  * the training corpus reproduces the trainer's final symbol state
  * (and what the chained-CTE oracle computes). Returns
  * `array<string>` tokens; the empty word yields an empty array.
  *
  * Codepoints, not UTF-16 units, for the initial alphabet — the
  * [[WinnowFps]] character-semantics convention (DuckDB's substr is
  * codepoint-based; splitting a surrogate pair would diverge on any
  * non-BMP text).
  *
  * The merge list rides as ONE string literal
  * ([[BpeApply.encode]] — the [[IvfCell]] codebook convention), so
  * the plan is constant-size in the number of merges.
  *
  * CodegenFallback like [[WinnowFps]]: the win is the per-row
  * primitive loop (O(len · nMerges) per word, vocabulary-bounded
  * symbol strings), not expression codegen.
  */
case class BpeApply(child: Expression, mergesEnc: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val merges: Array[(String, String)] =
    BpeApply.decode(mergesEnc)

  // Per-thread word → tokens memo (guide §4.5, the UlmViterbi
  // discipline): the merge replay is a pure function of (word, merge
  // list) and occurrences vastly outnumber types, so each thread
  // replays a TYPE once. ThreadLocal for task-concurrency safety; the
  // cached GenericArrayData is immutable to consumers; bounded at 64k
  // entries.
  @transient private lazy val memo:
      ThreadLocal[java.util.HashMap[String, GenericArrayData]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, GenericArrayData]())

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val m = memo.get()
    val hit = m.get(w)
    if (hit != null) return hit
    val res = apply(w)
    if (m.size >= 65536) m.clear()
    m.put(w, res)
    res
  }

  private def apply(w: String): GenericArrayData = {
    var syms: Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var mi = 0
    while (mi < merges.length && syms.length > 1) {
      val (a, b) = merges(mi)
      val merged = a + b
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += merged
          i += 2 // non-overlapping: the consumed pair can't re-match
        } else {
          out += syms(i)
          i += 1
        }
      }
      syms = out.toArray
      mi += 1
    }
    new GenericArrayData(syms.map(UTF8String.fromString(_): Any))
  }
  // (apply body above is the r17-verified oracle-parity replay,
  // unchanged)

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  // symbols come from corpus words (split on space, so they contain no
  // spaces) — the US/RS control characters cannot collide with text
  // that survived a space-split of parquet-read UTF-8
  private val FS = '\u001f' // between the two halves of one merge
  private val RS = '\u001e' // between merges

  /** Serialize an ordered merge list for the literal argument. */
  def encode(merges: Seq[(String, String)]): String = {
    require(merges.forall { case (a, b) =>
      !a.exists(c => c == FS || c == RS) && !b.exists(c => c == FS || c == RS)
    }, "graft_bpe_apply: merge symbols must not contain \\u001e/\\u001f")
    merges.map { case (a, b) => s"$a$FS$b" }.mkString(RS.toString)
  }

  private[functions] def decode(enc: String): Array[(String, String)] =
    if (enc.isEmpty) Array.empty
    else enc.split(RS).map { m =>
      val i = m.indexOf(FS)
      require(i >= 0, s"graft_bpe_apply: malformed merge entry '$m'")
      (m.substring(0, i), m.substring(i + 1))
    }
}
