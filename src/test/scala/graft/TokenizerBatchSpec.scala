package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Batched BPE/WordPiece merge training — the byte-identity contract:
  * selecting the top-m mutually non-interacting merges per round and
  * applying them in one pass must reproduce the merge-per-round
  * trainer EXACTLY (list, order, counts, scores), on fixtures where
  * batch members do and don't interact, and on the corpus. Also pins
  * the two refinements that make the naive skip-and-continue batching
  * unsound: (1) stop at the first interacting pair (a skipped
  * interacting pair can keep its count and overtake later batch
  * members), (2) strict boundary dominance / the WordPiece score
  * ceiling (scores of interacting pairs can RISE as symbol counts
  * shrink).
  */
class TokenizerBatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---------------------------------------------------------------
  // selectBpeBatch — the driver-side rule, unit-level
  // ---------------------------------------------------------------

  test("bpe batch: disjoint prefix with strict count dominance is accepted whole") {
    // ranked by (cnt desc, a, b); all symbol sets disjoint, counts
    // strictly above the boundary row ("e","f") which conflicts with
    // nothing — no conflict at all, so the boundary is absent and the
    // whole list is accepted
    val ranked = Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L))
    assert(TextOps.selectBpeBatch(ranked, ranked, 10) === ranked)
  }

  test("bpe batch: stops at the first interacting pair and truncates to strict dominance") {
    // ("x","a") shares 'a' with rank 1 → conflict at rank 3, boundary
    // cnt 7; accepted = prefix with cnt > 7 → only rank 1 (rank 2 ties
    // the boundary at 8 > 7 → kept; rank 2 cnt 8 > 7 so kept)
    val ranked = Seq(("a", "b", 10L), ("c", "d", 8L), ("x", "a", 7L), ("e", "f", 6L))
    assert(TextOps.selectBpeBatch(ranked, ranked, 10) === Seq(("a", "b", 10L), ("c", "d", 8L)))
    // boundary tie: rank 2 cnt equals the conflict cnt → dropped, and
    // the accepted batch shrinks to rank 1
    val tied = Seq(("a", "b", 10L), ("c", "d", 7L), ("x", "a", 7L))
    assert(TextOps.selectBpeBatch(tied, tied, 10) === Seq(("a", "b", 10L)))
  }

  test("bpe batch: falls back to the sequential argmax when the rule accepts nothing") {
    // rank 2 conflicts and ties rank 1's count → strict dominance
    // rejects rank 1 too → fallback = rank 1 alone (exact argmax)
    val ranked = Seq(("a", "b", 10L), ("b", "c", 10L))
    assert(TextOps.selectBpeBatch(ranked, ranked, 10) === Seq(("a", "b", 10L)))
  }

  test("bpe batch: a product colliding with a live pair member stops the batch") {
    // ("c","d") product "cd" appears as a member of a ranked pair →
    // merging it would stack new-symbol occurrences onto the existing
    // ("cd","e") count — conflict at rank 2, boundary 8, accept rank 1
    val ranked = Seq(("a", "b", 10L), ("c", "d", 8L), ("cd", "e", 3L))
    assert(TextOps.selectBpeBatch(ranked, ranked, 10) === Seq(("a", "b", 10L)))
  }

  test("bpe batch: a product colliding with a pair BELOW the ranked horizon stops the batch") {
    // the r16 ADVICE gap: ("c","d") product "cd" lives only in the
    // full pair stats (as if ranked were truncated at MergeBatchCap) —
    // members built from `ranked` alone would miss it and accept the
    // unsound batch; members from fullStats must stop at rank 2
    val ranked = Seq(("a", "b", 10L), ("c", "d", 8L))
    val full = ranked ++ Seq(("cd", "e", 3L))
    assert(TextOps.selectBpeBatch(ranked, full, 10) === Seq(("a", "b", 10L)))
    // sanity: with the horizon-only stats the unsound batch WOULD pass
    assert(TextOps.selectBpeBatch(ranked, ranked, 10) === ranked)
  }

  test("bpe batch: remaining cap truncates the prefix") {
    val ranked = Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L))
    assert(TextOps.selectBpeBatch(ranked, ranked, 2) === Seq(("a", "b", 10L), ("c", "d", 8L)))
    assert(TextOps.selectBpeBatch(ranked, ranked, 0) === Seq.empty)
  }

  // ---------------------------------------------------------------
  // corpus-level byte-identity, batched vs merge-per-round
  // ---------------------------------------------------------------

  test("bpe: the skip-and-continue counterexample — batched stays sequential-exact") {
    // "xa"×4's (x,a) interacts with (a,b) but merging (a,b) does NOT
    // consume its count (no 'ab' inside "xa") — a skip-and-continue
    // batcher would merge (c,d) as merge #2; the sequential order is
    // (a,b), (x,a), (c,d). The stop rule must reproduce it.
    val c = docs((1L to 5).map(i => i -> "ab"): _*) // cnt(a,b)=5
      .union(docs((11L to 14).map(i => i -> "xa"): _*)) // cnt(x,a)=4
      .union(docs((21L to 23).map(i => i -> "cd"): _*)) // cnt(c,d)=3
    val batched = TextOps.bpeTrainMerges(c, 3)
    assert(batched === TextOps.bpeTrainMergesSeq(c, 3))
    assert(batched.map(m => (m._2, m._3)) === Seq(("a", "b"), ("x", "a"), ("c", "d")))
  }

  test("bpe: batched equals sequential on the corpus, in fewer rounds") {
    val c = Tables.documents(spark, "/root/testdata/sf0.001")
    val nM = 48
    val batches = TextOps.bpeTrainBatches(c, nM)
    val flat = batches.flatten.zipWithIndex.map { case ((a, b, n), i) => (i + 1, a, b, n) }
    assert(flat === TextOps.bpeTrainMergesSeq(c, nM))
    assert(flat.size === nM)
    // the whole point: strictly fewer rounds than merges
    assert(batches.size < nM,
      s"expected real batching, got ${batches.size} rounds for $nM merges")
  }

  // ---------------------------------------------------------------
  // selectWpBatch — the likelihood-ranking rule, unit-level
  // ---------------------------------------------------------------

  test("wordpiece batch: score ceiling truncates when an interacting pair could rise") {
    // symbol counts: a=100, ##b=50, x=4, ##a... pair ("x","##a")
    // interacts with ("a","##b")? No shared symbol — use ("x","##b"):
    // shares ##b. Its ceiling score ln(4) − ln(cLB(x)) − ln(cLB(##b))
    // with cLB(##b) = 50 − 40 = 10 rises above the second candidate's
    // score → the second candidate is cut, fallback keeps rank 1.
    val symCnt = Map("a" -> 100L, "##b" -> 50L, "x" -> 4L, "##y" -> 45L)
    def q(x: Double) = math.floor(x * 1e6 + 0.5001) / 1e6
    val s1 = q(math.log(40.0) - math.log(100.0) - math.log(50.0))
    val s2 = q(math.log(40.0) - math.log(45.0) - math.log(100.0))
    val ranked = Seq(("a", "##b", 40L, s1), ("##y", "a", 40L, s2))
    // wait — ("##y","a") shares 'a' with rank 1 → conflict, batch = rank 1
    assert(TextOps.selectWpBatch(ranked, ranked.map(p => (p._1, p._2, p._3)),
      symCnt, 10) === Seq(ranked.head))
  }

  test("wordpiece batch: disjoint pairs far above the ceiling are accepted together") {
    // two disjoint pairs with large counts; interacting tail pair has
    // tiny count so its risen-score ceiling stays far below
    val symCnt = Map("a" -> 1000L, "##b" -> 1000L, "c" -> 1000L,
      "##d" -> 1000L, "x" -> 900L)
    def q(x: Double) = math.floor(x * 1e6 + 0.5001) / 1e6
    val s1 = q(math.log(900.0) - math.log(1000.0) - math.log(1000.0))
    val s2 = q(math.log(880.0) - math.log(1000.0) - math.log(1000.0))
    val s3 = q(math.log(2.0) - math.log(900.0) - math.log(1000.0))
    val ranked = Seq(("a", "##b", 900L, s1), ("c", "##d", 880L, s2),
      ("x", "##b", 2L, s3))
    val full = ranked.map(p => (p._1, p._2, p._3))
    // ceiling: interacting ("x","##b") can rise to ln2 − ln(max(1,900)) −
    // ln(max(1,1000−900)) = ln2 − ln900 − ln100 ≈ −11.4; new-pair bound
    // −ln(450) ≈ −6.1; both far below s2 ≈ −7.0? −6.1 > −7.0! The
    // new-pair ceiling CUTS the batch to pairs scoring above −6.1 —
    // neither does → fallback rank 1. The conservative rule trades
    // batch size for soundness; identity is what the corpus test pins.
    val got = TextOps.selectWpBatch(ranked, full, symCnt, 10)
    assert(got === Seq(ranked.head))
  }

  test("wordpiece: batched equals sequential on the corpus") {
    val c = Tables.documents(spark, "/root/testdata/sf0.001")
    val nM = 32
    val batches = TextOps.wordpieceTrainBatches(c, nM)
    val flat = batches.flatten.zipWithIndex
      .map { case ((a, b, n, s), i) => (i + 1, a, b, n, s) }
    assert(flat === TextOps.wordpieceTrainMergesSeq(c, nM))
    assert(flat.size === nM)
  }

  test("wordpiece: batched equals sequential on an interacting fixture") {
    val c = docs(
      1L -> "aa aa aa ab ab ba", 2L -> "cc cc cd dc dd", 3L -> "aa cc ad",
      4L -> "abc abd acd", 5L -> "bb bb bc cb", 6L -> "aa bb cc dd")
    val nM = 12
    assert(TextOps.wordpieceTrainMerges(c, nM) ===
      TextOps.wordpieceTrainMergesSeq(c, nM))
  }

  test("bpe: batched equals sequential on an interacting fixture") {
    val c = docs(
      1L -> "aa aa aa ab ab ba", 2L -> "cc cc cd dc dd", 3L -> "aa cc ad",
      4L -> "abc abd acd", 5L -> "bb bb bc cb", 6L -> "aa bb cc dd")
    val nM = 12
    assert(TextOps.bpeTrainMerges(c, nM) === TextOps.bpeTrainMergesSeq(c, nM))
  }

  // ---------------------------------------------------------------
  // the collected (in-memory, production-shape) trainer
  // ---------------------------------------------------------------

  test("bpe: collected trainer equals sequential AND batched through exhaustion") {
    val c = Tables.documents(spark, "/root/testdata/sf0.001")
    // nMerges far past the corpus's pair supply: all three trainers
    // must exhaust at the SAME merge with identical lists
    val nM = 120
    val collected = TextOps.bpeTrainMerges(c, nM)
    assert(collected === TextOps.bpeTrainMergesSeq(c, nM))
    assert(collected === TextOps.bpeTrainBatches(c, nM).flatten.zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, n) })
    assert(collected.nonEmpty && collected.size < nM,
      s"expected exhaustion below $nM, got ${collected.size}")
  }

  test("bpe/wordpiece: the collect guard routes oversized type tables to the distributed loop") {
    val c = Tables.documents(spark, "/root/testdata/sf0.001")
    val nM = 24
    // collectMax=0 forces every type table over the bound → the
    // distributed batched route must produce the identical list the
    // collected route produces under the default bound (routing is a
    // plan decision, never a semantics one)
    assert(TextOps.bpeTrainMerges(c, nM, collectMax = 0L) ===
      TextOps.bpeTrainMerges(c, nM))
    assert(TextOps.wordpieceTrainMerges(c, nM, collectMax = 0L) ===
      TextOps.wordpieceTrainMerges(c, nM))
  }

  test("wordpiece: collected trainer equals sequential AND batched through exhaustion") {
    val c = Tables.documents(spark, "/root/testdata/sf0.001")
    val nM = 110
    val collected = TextOps.wordpieceTrainMerges(c, nM)
    assert(collected === TextOps.wordpieceTrainMergesSeq(c, nM))
    assert(collected === TextOps.wordpieceTrainBatches(c, nM).flatten.zipWithIndex
      .map { case ((a, b, n, s), i) => (i + 1, a, b, n, s) })
    assert(collected.nonEmpty && collected.size < nM,
      s"expected exhaustion below $nM, got ${collected.size}")
  }
}
