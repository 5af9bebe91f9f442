package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a UNIGRAM-LM piece
  * vocabulary (Kudo 2018, SentencePiece's unigram model): pick the
  * piece sequence maximizing Σ log p(piece) — the E-step of unigram-LM
  * tokenizer training and the encoder of the shipped tokenizer
  * (reference scope: the tokenizer-real counting mandate behind
  * `/root/reference/src/demo/utils.py`'s corpus prep, extended).
  * Returns `array<string>` pieces; the empty word yields an empty
  * array.
  *
  * DP over codepoint positions: `best(i) = max over piece lengths
  * l = 1..min(maxPieceLen, i)` with `piece = w[i-l, i) ∈ vocab` of
  * `best(i-l) + lnp(piece)`; ties break on HIGHER score, then FEWER
  * pieces, then LONGER last piece — the exact rule the DuckDB oracle's
  * chained position-CTE DP applies (`row_number() OVER (ORDER BY
  * score DESC, k ASC, l DESC)`), so both engines pick the identical
  * segmentation even on exact ties. Score sums accumulate in prefix
  * order on both sides, and the lnp inputs are floor-quantized at 1e-6
  * upstream, so score comparisons are bit-identical double compares.
  *
  * A codepoint absent from the vocabulary falls back to a single-char
  * piece at [[UlmViterbi.UnkLnp]] — the trainer always keeps the seed
  * alphabet so this never fires on the training corpus, but the
  * encoder stays total on unseen text.
  *
  * Codepoints, not UTF-16 units ([[BpeApply]]'s convention — DuckDB's
  * substr is codepoint-based). The vocabulary rides as ONE string
  * literal ([[UlmViterbi.encode]]), so the plan is constant-size in
  * the vocabulary.
  *
  * CodegenFallback like [[BpeApply]]: the win is the per-row DP loop
  * (O(len · maxPieceLen) hash probes per word), not expression
  * codegen.
  */
case class UlmViterbi(child: Expression, vocabEnc: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val vocab: Map[String, Double] =
    UlmViterbi.decode(vocabEnc)
  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1
    else math.max(1, vocab.keysIterator.map(p => p.codePointCount(0, p.length)).max)

  // Per-thread word → segmentation memo (guide §4.5: amortize per-row
  // work across a task): the encoder is a pure function of (word,
  // vocab) and corpora are Zipfian — occurrences vastly outnumber
  // types — so each thread segments a TYPE once and replays the
  // result. ThreadLocal because an expression instance can be shared
  // across concurrently-running tasks; the returned GenericArrayData
  // is immutable (consumers copy on write into unsafe rows). Bounded:
  // cleared when it reaches 64k entries so an adversarial stream of
  // unique words cannot grow it past a few MB.
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

  private def segment(w: String): GenericArrayData = {
    val cps: Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // (segment body unchanged — the DP below is the r17-verified
    // oracle-parity implementation)
    // best(i): score, piece count k, and the length of the LAST piece
    // (the local tie-break); back(i) = that piece's start
    val score = new Array[Double](n + 1)
    val k = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var found = false
      var bScore = 0.0; var bK = 0; var bL = 0
      var l = math.min(maxPieceLen, i)
      // descending l: on exact (score, k) ties the LONGEST last piece
      // wins, so strictly-better-only updates keep the first (longest)
      while (l >= 1) {
        val piece = cps.slice(i - l, i).mkString
        val lnpOpt = vocab.get(piece)
        val lnp =
          if (lnpOpt.isDefined) lnpOpt.get
          else if (l == 1) UlmViterbi.UnkLnp
          else Double.NaN
        if (!lnp.isNaN) {
          val s = score(i - l) + lnp
          val kk = k(i - l) + 1
          val better = !found || s > bScore || (s == bScore && kk < bK)
          if (better) {
            found = true; bScore = s; bK = kk; bL = l
          }
        }
        l -= 1
      }
      // every position is reachable: l=1 always yields a piece (vocab
      // char or the UNK fallback)
      score(i) = bScore; k(i) = bK; back(i) = i - bL
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](k(n))
    var p = n
    while (p > 0) {
      val s = back(p)
      out += cps.slice(s, p).mkString
      p = s
    }
    new GenericArrayData(out.reverse.map(UTF8String.fromString(_): Any).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UlmViterbi =
    copy(child = newChild)
}

object UlmViterbi {
  // pieces come from corpus words (split on space) — the BpeApply
  // control-character convention cannot collide with real text
  private val FS = '\u001f' // between piece and its lnp
  private val RS = '\u001e' // between vocab entries

  /** UNK log-prob for a single codepoint outside the vocabulary —
    * far below any real piece so it never displaces one, finite so
    * the encoder stays total. The oracle never exercises it (the
    * trainer keeps the seed alphabet).
    */
  val UnkLnp: Double = -25.0

  /** Serialize (piece → lnp) for the literal argument. lnp doubles
    * round-trip exactly through toString/parseDouble (shortest
    * round-trip repr), so the expression's DP sums the bit-identical
    * quantized values the trainer computed.
    */
  def encode(vocab: Seq[(String, Double)]): String = {
    require(vocab.forall { case (p, _) =>
      p.nonEmpty && !p.exists(c => c == FS || c == RS)
    }, "graft_ulm_viterbi: pieces must be non-empty without \\u001e/\\u001f")
    vocab.map { case (p, lnp) => s"$p$FS$lnp" }.mkString(RS.toString)
  }

  private[functions] def decode(enc: String): Map[String, Double] =
    if (enc.isEmpty) Map.empty
    else enc.split(RS).iterator.map { e =>
      val i = e.indexOf(FS)
      require(i >= 0, s"graft_ulm_viterbi: malformed vocab entry '$e'")
      (e.substring(0, i), e.substring(i + 1).toDouble)
    }.toMap
}
