package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm): hash every `k`-character gram (polynomial base 31
  * mod 1e9+7 — [[RollingHash31]]'s arithmetic per position), slide a
  * window of `w` consecutive hashes, and select each window's minimum
  * (ties → the RIGHTMOST position). Selected (pos, fp) pairs are the
  * document's local fingerprints: any shared substring of length
  * ≥ k + w − 1 between two documents is GUARANTEED to share a
  * fingerprint — the substring-level dedup primitive (exact-substring
  * dedup à la "Deduplicating Training Data Makes Language Models
  * Better", at fingerprint rather than suffix-array granularity).
  *
  * Returns `array<struct<pos:int, fp:bigint>>` (1-based gram
  * positions, ascending; empty for texts shorter than k). A position
  * is recorded once — a window's winner can only repeat while it
  * stays the rightmost minimum of consecutive windows, so dedup-by-
  * last-recorded equals set-distinctness.
  *
  * Bit-portability: per-position hash = Σ cp_i·31^{k−1−i} mod 1e9+7
  * over CODEPOINTS (matching DuckDB's character semantics — UTF-16
  * units would diverge on non-BMP text), folded as
  * `(h·31 + c) mod M` — exact integer arithmetic; with
  * k ≤ 8 an engine can equivalently evaluate the power sum in plain
  * BIGINT range and take one final mod, which is how the DuckDB
  * oracle states it. If fewer than `w` hashes exist, one window
  * covers them all (every non-empty-gram doc yields ≥ 1 fingerprint).
  *
  * CodegenFallback like [[NgramStats]]: one primitive-loop pass per
  * row is the win. Hashing is a true rolling update and selection a
  * monotone deque — O(n) per row total, independent of k and w.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"graft_winnow: k must be >= 1, got $k")
  require(w >= 1, s"graft_winnow: w must be >= 1, got $w")

  private val M = 1000000007L

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    // iterate CODEPOINTS, not UTF-16 chars: DuckDB's substr/ascii are
    // character(codepoint)-based, so hashing surrogate pairs as two
    // units would silently break gate parity on any non-BMP text
    // (emoji etc.); positions below are 1-based codepoint positions
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val nH = n - k + 1
    if (nH <= 0) return new GenericArrayData(Array.empty[Any])
    // TRUE rolling hash (VERDICT r8 #4): h(p+1) = (h(p) − cp(p)·31^{k−1})
    // ·31 + cp(p+k) mod M — exact modular integer arithmetic, so values
    // are bit-identical to the per-position recompute it replaces
    // (PropertySpec's independent reference pins equality). O(n) total
    // hashing instead of O(n·k). Intermediate bound: cp ≤ 0x10FFFF and
    // pow, h < M ≈ 1e9, so every product stays far inside a Long.
    var pow = 1L // 31^{k−1} mod M
    var i = 1
    while (i < k) { pow = pow * 31L % M; i += 1 }
    val hashes = new Array[Long](nH)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31L + cps(i).toLong) % M; i += 1 }
    hashes(0) = h
    var p = 1
    while (p < nH) {
      h = ((h + M - cps(p - 1).toLong * pow % M) % M * 31L + cps(p + k - 1).toLong) % M
      hashes(p) = h
      p += 1
    }
    // Monotone deque (strictly increasing hash front→back): pushing a
    // new index pops every back entry with hash >= its own, so among
    // equal minima the NEWEST survives — the front is always the
    // window's RIGHTMOST minimum, exactly the `<=` ascending-scan rule
    // it replaces. O(n) total window selection instead of O(n·w).
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val nWin = math.max(1, nH - w + 1)
    val deque = new Array[Int](nH)
    var head = 0
    var tail = 0
    var lastPos = -1
    var nextIdx = 0
    var j = 0
    while (j < nWin) {
      val end = math.min(j + w, nH)
      while (nextIdx < end) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(nextIdx)) tail -= 1
        deque(tail) = nextIdx
        tail += 1
        nextIdx += 1
      }
      while (deque(head) < j) head += 1
      val bestP = deque(head)
      if (bestP != lastPos) {
        out += new GenericInternalRow(Array[Any](bestP + 1, hashes(bestP)))
        lastPos = bestP
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}
