package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Unigram-LM tokenizer contracts (Kudo 2018 / SentencePiece): the
  * Viterbi DP picks the max-log-prob segmentation with the exact
  * (score DESC, k ASC, longest-last-piece) tie order the oracle's
  * chained CTEs apply; the trainer's hard-EM prunes unused multi-char
  * pieces but never the alphabet; the Viterbi corpus log-likelihood
  * is non-decreasing across EM rounds on the pinned fixtures.
  */
class UlmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Segment one word through the registered SQL surface — the same
    * path the operators use.
    */
  private def seg(word: String, vocab: Seq[(String, Double)]): Seq[String] = {
    graft.functions.VectorExprs.register(spark)
    val enc = graft.functions.UlmViterbi.encode(vocab)
      .replace("\\", "\\\\").replace("'", "\\'")
    import spark.implicits._
    Seq(word).toDF("w").selectExpr(s"graft_ulm_viterbi(w, '$enc')")
      .collect().head.getSeq[String](0).toSeq
  }

  test("viterbi picks the max-score segmentation over all piece splits") {
    val v = Seq("ab" -> -1.0, "a" -> -3.0, "b" -> -3.0, "c" -> -3.0, "abc" -> -2.5)
    // [abc] = -2.5 beats [ab,c] = -4.0 and [a,b,c] = -9.0
    assert(seg("abc", v) === Seq("abc"))
    // [ab,ab] = -2.0 beats anything using singles
    assert(seg("abab", v) === Seq("ab", "ab"))
  }

  test("tie on score: fewer pieces win; tie on (score, k): longer last piece wins") {
    // [ab] = -2.0 (k=1) ties [a,b] = -2.0 (k=2) → fewer pieces
    assert(seg("ab", Seq("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0)) === Seq("ab"))
    // [a,bc] = -3.0 (k=2, last len 2) ties [ab,c] = -3.0 (k=2, last
    // len 1) → longer LAST piece — the oracle's l DESC rank
    assert(seg("abc", Seq("a" -> -1.0, "bc" -> -2.0, "ab" -> -2.0, "c" -> -1.0))
      === Seq("a", "bc"))
  }

  test("a codepoint outside the vocabulary falls back to a single UNK piece") {
    assert(seg("az", Seq("a" -> -1.0)) === Seq("a", "z"))
    assert(seg("", Seq("a" -> -1.0)) === Seq.empty)
  }

  test("trainer: pieces are corpus substrings, the alphabet survives, unused multi-char pieces prune") {
    // 'xy' appears often enough to seed, but every Viterbi path
    // prefers the dominant 'xyz' whole-word piece, so 'xy' must prune
    val d = docs(
      0L -> "xyz xyz xyz xyz xyz xyz",
      1L -> "xyz xyz xyz xyz q")
    val vocab = TextOps.ulmTrainVocab(d, 10, 2)
    val pieces = vocab.map(_._1).toSet
    assert(Set("x", "y", "z", "q").subsetOf(pieces), "alphabet must survive every round")
    assert(pieces.contains("xyz"), "the dominant whole word must survive")
    val words = Set("xyz", "q")
    assert(vocab.forall { case (p, _, _) => words.exists(_.contains(p)) })
    // every multi-char survivor carries a positive Viterbi count;
    // 'xy'/'yz' lost every segmentation to 'xyz' and are gone
    assert(vocab.filter(_._1.length > 1).forall(_._2 > 0))
    assert(!pieces.contains("xy") && !pieces.contains("yz"))
  }

  test("EM monotonicity: Viterbi corpus log-likelihood is non-decreasing across rounds (fixture + sf0.001)") {
    def ll(d: org.apache.spark.sql.DataFrame, vocab: Seq[(String, Long, Double)]): Double = {
      val lnp = vocab.map(v => (v._1, v._3)).toMap
      val words = d.selectExpr("explode(split(text, ' ')) AS w")
        .where("length(w) >= 1 AND length(w) <= 12")
        .groupBy("w").count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      words.map { case (w, f) =>
        f * seg(w, vocab.map(v => (v._1, v._3)))
          .map(p => lnp.getOrElse(p, graft.functions.UlmViterbi.UnkLnp)).sum
      }.sum
    }
    val fixtures = Seq(
      docs(0L -> "abab abab ab cd cd cdcd", 1L -> "ab ab cd abcd abcd"),
      Tables.documents(spark, "/root/testdata/sf0.001"))
    for (d <- fixtures) {
      val v1 = TextOps.ulmTrainVocab(d, 20, 1)
      val v2 = TextOps.ulmTrainVocab(d, 20, 2)
      val v3 = TextOps.ulmTrainVocab(d, 20, 3)
      assert(ll(d, v2) >= ll(d, v1) - 1e-9, "round 2 must not lose likelihood")
      assert(ll(d, v3) >= ll(d, v2) - 1e-9, "round 3 must not lose likelihood")
    }
  }

  test("prune-to-target: schedule literals, target size, alphabet survival, and EM monotonicity ACROSS a prune step") {
    // the schedule is the shared engine/oracle formula — pin its
    // literals (geometric with a floor at the target, last step = target)
    assert(TextOps.ulmPruneSchedule(40, 16, 0.5) === Seq(20, 16))
    assert(TextOps.ulmPruneSchedule(40, 16, 0.75) === Seq(30, 23, 17, 16))
    assert(TextOps.ulmPruneSchedule(20, 10, 0.5) === Seq(10))
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val base = TextOps.ulmTrainVocab(d, 20, 2)
    val alphabet = base.filter(_._1.length == 1).map(_._1).toSet
    // single-step schedule (20 → 10): trained = prune(base) + one EM
    // round; the multi-char set lands AT/UNDER the target and the
    // alphabet survives every cut
    val pruned = TextOps.ulmTrainVocab(d, 20, 2, targetVocab = 10, shrink = 0.5)
    assert(pruned.count(_._1.length >= 2) <= 10,
      "the pruned vocabulary must reach the target multi-char size")
    assert(alphabet.subsetOf(pruned.filter(_._1.length == 1).map(_._1).toSet),
      "the alphabet must survive pruning — segmentation stays total")
    // EM monotonicity across the prune step (the inductive claim the
    // schedule composes from): emulate the prune+re-smooth exactly
    // (top-target by q6(c·−lnp), ties piece ASC; lnp = q6(ln((c+1)/Σ)))
    // and assert the trained result — pruned vocab + one EM round —
    // does not lose Viterbi corpus likelihood vs its pruned start
    def q6(x: Double) = math.floor(x * 1e6 + 0.5001) / 1e6
    val kept = base.filter(_._1.length >= 2)
      .sortBy { case (p, c, lnp) => (-q6(c * -lnp), p) }.take(10)
    val chars = base.filter(_._1.length == 1)
    val counts = (kept ++ chars).map(v => (v._1, v._2)).sortBy(_._1)
    val tot = counts.map(_._2 + 1L).sum.toDouble
    val prunedStart = counts.map { case (p, c) => (p, c, q6(math.log((c + 1L) / tot))) }
    def ll(vocab: Seq[(String, Long, Double)]): Double = {
      val lnp = vocab.map(v => (v._1, v._3)).toMap
      val words = d.selectExpr("explode(split(text, ' ')) AS w")
        .where("length(w) >= 1 AND length(w) <= 12")
        .groupBy("w").count().collect()
        .map(r => (r.getString(0), r.getLong(1)))
      words.map { case (w, f) =>
        f * seg(w, vocab.map(v => (v._1, v._3)))
          .map(p => lnp.getOrElse(p, graft.functions.UlmViterbi.UnkLnp)).sum
      }.sum
    }
    assert(ll(pruned) >= ll(prunedStart) - 1e-9,
      "the EM round after a prune must not lose likelihood vs the pruned start")
  }

  test("ULM token budget: costs equal the encoder's n_tokens; every shard's first doc survives") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = TextOps.ulmTrainVocab(d, 40, 2).map(v => (v._1, v._3))
    val encTok = TextOps.ulmEncode(d, vocab).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = TextOps.sampleTokenBudgetUlm(d, 40, 2, 2000L).collect()
    assert(out.nonEmpty)
    for (r <- out)
      assert(r.getAs[Long]("n_tokens") === encTok(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: the budget's cost model must BE the encoder")
    // first-doc-per-shard guarantee: stream_pos is exclusive, so every
    // shard's seeded-first doc has position 0 < budget
    val shards = d.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getAs[String]("shard")).toSet === shards)
  }

  test("fertility: per-language tokens/word and chars/token match the per-type segmentation") {
    import spark.implicits._
    val d = Seq(
      (0L, "abab abab cd", "aa"),
      (1L, "cd cd", "bb")).toDF("doc_id", "text", "lang")
    val vocab = TextOps.ulmTrainVocab(d, 10, 2).map(v => (v._1, v._3))
    val segLen = Map("abab" -> seg("abab", vocab).length, "cd" -> seg("cd", vocab).length)
    val out = TextOps.ulmFertility(d, 10, 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // lang aa: 2×abab + 1×cd; lang bb: 2×cd — exact type-weighted sums
    val aaToks = 2L * segLen("abab") + segLen("cd")
    val bbToks = 2L * segLen("cd")
    assert(out("aa")._1 === 3L && out("aa")._2 === aaToks)
    assert(out("bb")._1 === 2L && out("bb")._2 === bbToks)
    def r3d(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0
    assert(out("aa")._3 === r3d(aaToks.toDouble / 3.0))
    assert(out("bb")._3 === r3d(bbToks.toDouble / 2.0))
  }

  test("encode: n_tokens and fingerprint match the hand segmentation") {
    val d = docs(0L -> "abab cd", 1L -> "")
    // force a vocab by training: 'abab'→ whole-word piece is capped at
    // maxPieceLen=4 so 'abab' itself can seed; verify against the
    // expression's own segmentation (self-consistency, order kept)
    val vocab = TextOps.ulmTrainVocab(d, 10, 2).map(v => (v._1, v._3))
    val enc = TextOps.ulmEncode(d, vocab).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"), r.getAs[String]("fp")))
      .sortBy(_._1)
    val toks0 = seg("abab", vocab) ++ seg("cd", vocab)
    assert(enc(0)._2 === toks0.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(toks0.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(enc(0)._3 === md)
    assert(enc(1)._2 === 0L, "empty text encodes to zero tokens")
  }
}
