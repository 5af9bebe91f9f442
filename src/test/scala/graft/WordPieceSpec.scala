package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** WordPiece contracts (Schuster & Nakajima 2012): the trainer's
  * likelihood-score argmax (NOT raw pair frequency — the fixture makes
  * them disagree), the `##` marking invariant, greedy
  * longest-match-first encoding (including the case where it diverges
  * from merge replay — WordPiece's defining property), [UNK] on
  * unseen characters and over-length words, and fertility accounting.
  */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("trainer picks the likelihood argmax, not the frequency argmax") {
    // "ab" appears 10× (always together, each 1×) — pair (a,##b)
    //   cnt=10, c(a)=10, c(##b)=10 → score 10/100 = 0.1
    // "xy" appears 6× and x,y appear ONLY there — pair (x,##y)
    //   cnt=6, c(x)=6, c(##y)=6 → score 6/36 ≈ 0.167 > 0.1
    // plain BPE would merge (a,##b) first (10 > 6); WordPiece must
    // merge (x,##y) first
    val d = docs(0L -> (Seq.fill(10)("ab") ++ Seq.fill(6)("xy")).mkString(" "))
    val m = TextOps.wordpieceTrainMerges(d, 2)
    assert(m.head._2 === "x" && m.head._3 === "##y" && m.head._4 === 6L)
    assert(m(1)._2 === "a" && m(1)._3 === "##b" && m(1)._4 === 10L)
  }

  test("merged symbols keep the left half's ## marking across rounds") {
    // one word "abc" repeated: rounds merge into ##-consistent symbols;
    // the final merge list must contain only pairs whose rhs is
    // ##-prefixed, and merged strings keep lhs marking
    val d = docs(0L -> Seq.fill(5)("abc").mkString(" "))
    val m = TextOps.wordpieceTrainMerges(d, 2)
    assert(m.forall(_._3.startsWith("##")))
    val vocab = TextOps.wordpieceVocab(d, 2)
    // the full word assembles: "abc" (bare — starts at position 1)
    assert(vocab.contains("abc"))
    // and the alphabet marks continuations
    assert(vocab.contains("##b") && vocab.contains("##c") && vocab.contains("a"))
  }

  private def encodeOne(word: String, vocab: Seq[String],
                        maxChars: Int = 12): Seq[String] = {
    val out = TextOps.wordpieceEncode(docs(0L -> word), vocab, maxChars)
      .collect().head
    // decode via a direct call for token CONTENT
    graft.functions.VectorExprs.register(spark)
    val enc = graft.functions.WordPieceApply.encode(vocab)
      .replace("\\", "\\\\").replace("'", "\\'")
    val toks = docs(0L -> word)
      .select(expr(s"graft_wordpiece_apply(text, '$enc', $maxChars)").as("t"))
      .collect().head.getSeq[String](0)
    assert(out.getAs[Long]("n_tokens") === toks.length)
    toks
  }

  test("greedy longest-match-first: the longest vocab piece wins at each position") {
    val vocab = Seq("u", "un", "una", "##n", "##a", "##b", "##le", "##l", "##e",
      "##able", "##nable")
    // greedy takes "una" (longest start match), then "##ble"? not in
    // vocab → "##b", then "##le" (longer than "##l")
    assert(encodeOne("unable", vocab) === Seq("una", "##b", "##le"))
  }

  test("greedy longest-match diverges from merge replay (the WordPiece property)") {
    // vocab contains "abc" but ALSO "ab": replaying merges
    // (a,##b)→ab, (ab,##c)→abc on "abcd" would first make "ab" then
    // need (##c,##d) pairs; greedy instead eats "abc" whole, leaving
    // "##d"
    val vocab = Seq("a", "ab", "abc", "##b", "##c", "##d")
    assert(encodeOne("abcd", vocab) === Seq("abc", "##d"))
  }

  test("[UNK]: unseen character and over-length words collapse whole, never partially") {
    val vocab = Seq("a", "ab", "##b", "##c")
    assert(encodeOne("abz", vocab) === Seq("[UNK]"))
    assert(encodeOne("a" * 13, vocab) === Seq("[UNK]"))
    // a stuck CONTINUATION also collapses the whole word — no partial
    // emission of the matched prefix
    assert(encodeOne("ba", vocab) === Seq("[UNK]"))
    // and within budget, pure repetition encodes fine
    assert(encodeOne("abbb", vocab) === Seq("ab", "##b", "##b"))
  }

  test("encoding the training corpus round-trips content (fp changes iff text changes)") {
    val d = docs(0L -> "scan merge scan", 1L -> "scan merge scans")
    val vocab = TextOps.wordpieceVocab(d, 4)
    val out = TextOps.wordpieceEncode(d, vocab).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("fp"))).sortBy(_._1)
    assert(out.forall(_._2 > 0))
    assert(out(0)._3 !== out(1)._3)
  }

  test("budget sampling: the running budget's n_tokens IS the encoder's (cost-model identity)") {
    val d = docs(
      0L -> "scan merge scan key",
      1L -> "merge merge key",
      2L -> "scan key key key merge")
      .withColumn("source", lit("s0"))
    val enc = TextOps.wordpieceEncode(d, TextOps.wordpieceVocab(d, 4))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val sampled = TextOps.sampleTokenBudgetWp(d, 4, 1000000L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens")))
    assert(sampled.length === 3, "a huge budget keeps every doc")
    for ((id, n) <- sampled) assert(n === enc(id),
      s"budget cost for doc $id must equal the encoder's token count")
  }

  test("token freq: counts are per-occurrence under greedy encoding; [UNK] buckets honestly") {
    // "ab" ×3 and "cd" ×2 merge fully (likelihood ties resolved by
    // the quantized rule); the 13-char word collapses to [UNK] ×2
    val d = docs(
      0L -> "ab ab ab cd cd",
      1L -> (("z" * 13) + " " + ("z" * 13)))
    val out = TextOps.wordpieceTokenFreq(d, 4, 20).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n")).toMap
    assert(out("ab") === 3L)
    assert(out("cd") === 2L)
    assert(out("[UNK]") === 2L)
  }

  test("fertility: an [UNK] word costs exactly 1 token") {
    // lang A: every word segments; lang B: one word has an unseen char
    // relative to... all chars are seen (training on the same corpus),
    // so force [UNK] via over-length: a 13-char word
    val d = docs(
      0L -> "aa bb",
      1L -> ("aa " + ("b" * 13)))
    val withLang = d.withColumn("lang",
      when(col("doc_id") === 0, lit("aa")).otherwise(lit("bb")))
    val f = TextOps.wordpieceFertility(withLang, 2).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1).toSeq
    // lang bb: "aa" → 1 token (merged) or 2; the 13-char word → 1
    // token ([UNK]); exact values pinned below via the trained vocab
    val vocab = TextOps.wordpieceVocab(withLang, 2)
    val aaToks = encodeOne("aa", vocab).length.toLong
    val bbToks = encodeOne("bb", vocab).length.toLong
    assert(f === Seq(("aa", 2L, aaToks + bbToks), ("bb", 2L, aaToks + 1L)))
  }
}
