package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization of one word (Schuster & Nakajima 2012; the
  * BERT encoder): GREEDY LONGEST-MATCH-FIRST over a learned vocabulary
  * — at the word start match among START pieces, at every later
  * position among CONTINUATION pieces (the `##`-prefixed ones, matched
  * by their stripped string and EMITTED with the `##`), always taking
  * the longest piece that matches. A position where nothing matches —
  * or a word longer than `maxInputChars` — makes the WHOLE word
  * `[UNK]` (the reference WordPiece's `max_input_chars_per_word`
  * behavior), never a partial emission. The empty word yields an empty
  * array.
  *
  * This is deliberately NOT the trainer's merge replay: greedy
  * longest-match is the defining property of WordPiece encoding (a
  * vocab piece `abc` wins at `abcd` even if the trainer reached `abc`
  * via `(ab, ##c)` merges that would replay differently) — the spec
  * pins a case where the two diverge.
  *
  * Codepoints, not UTF-16 units ([[BpeApply]]'s convention — DuckDB's
  * substr is codepoint-based). The vocabulary rides as ONE string
  * literal ([[WordPieceApply.encode]]), so the plan is constant-size;
  * pieces live in one hash set per class (start/continuation), probed
  * once per candidate length, longest first — O(maxPieceLen) probes
  * per position.
  *
  * CodegenFallback like [[BpeApply]]: the win is the per-row primitive
  * loop (O(len · maxPieceLen) hash probes per word), not expression
  * codegen.
  */
case class WordPieceApply(child: Expression, vocabEnc: String, maxInputChars: Int)
    extends UnaryExpression with CodegenFallback {

  // (start pieces, continuation pieces stripped of ##), each as the
  // codepoint-length-keyed probe sets, plus the max piece lengths
  @transient private lazy val (startSet, contSet, maxStartLen, maxContLen) = {
    val (starts, conts) = WordPieceApply.decode(vocabEnc)
    (starts.toSet, conts.toSet,
      if (starts.isEmpty) 0 else starts.map(s => s.codePointCount(0, s.length)).max,
      if (conts.isEmpty) 0 else conts.map(c => c.codePointCount(0, c.length)).max)
  }

  // Per-thread word → tokens memo (guide §4.5, the UlmViterbi
  // discipline): pure function of (word, vocab), Zipfian inputs —
  // segment a TYPE once per thread. Immutable cached value; bounded.
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
    val res = segment(w)
    if (m.size >= 65536) m.clear()
    m.put(w, res)
    res
  }

  // (segment body below is the r17-verified oracle-parity greedy
  // longest-match, unchanged)
  private def segment(w: String): GenericArrayData = {
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val cps = w.codePoints().toArray
    if (cps.length > maxInputChars)
      return new GenericArrayData(Array[Any](UTF8String.fromString("[UNK]")))
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var pos = 0
    while (pos < cps.length) {
      val atStart = pos == 0
      val maxL = math.min(if (atStart) maxStartLen else maxContLen, cps.length - pos)
      var l = maxL
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = new String(cps, pos, l)
        if (atStart) { if (startSet(cand)) hit = cand }
        else if (contSet(cand)) hit = "##" + cand
        if (hit == null) l -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString("[UNK]")))
      out += hit
      pos += l
    }
    new GenericArrayData(out.map(UTF8String.fromString(_): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceApply =
    copy(child = newChild)
}

object WordPieceApply {
  private val RS = '\u001e' // between pieces (the BpeApply convention)

  /** Serialize a vocabulary (pieces WITH their `##` markers — start
    * pieces bare, continuation pieces `##`-prefixed) for the literal
    * argument.
    */
  def encode(vocab: Seq[String]): String = {
    require(vocab.forall(p => !p.exists(_ == RS)),
      "graft_wordpiece_apply: vocab pieces must not contain \\u001e")
    vocab.mkString(RS.toString)
  }

  /** → (start pieces, continuation pieces with `##` STRIPPED). */
  private[functions] def decode(enc: String): (Array[String], Array[String]) = {
    val pieces = if (enc.isEmpty) Array.empty[String] else enc.split(RS)
    val (conts, starts) = pieces.partition(_.startsWith("##"))
    (starts, conts.map(_.substring(2)).filter(_.nonEmpty))
  }
}
