package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** ExactSubstr dedup contracts (Lee et al. 2022): the minLen
  * threshold is exact — a planted repeat one token past it is found
  * WHOLE (as one maximal span, at both occurrences), one token under
  * it is invisible; within-doc repetition counts as duplication; the
  * strip removes exactly the spanned positions and survives the
  * all-dup and no-dup edges.
  */
class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** w0..w{n-1} — unique filler tokens with prefix `pre`. */
  private def toks(pre: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$pre$i")

  test("a 60-token repeat is found whole at minLen=50; a 40-token repeat is not") {
    val repeat60 = toks("dup", 60)
    val repeat40 = toks("small", 40)
    val d = docs(
      0L -> (toks("a", 10) ++ repeat60 ++ toks("b", 10)).mkString(" "),
      1L -> (toks("c", 5) ++ repeat60 ++ toks("d", 25)).mkString(" "),
      2L -> (toks("e", 10) ++ repeat40 ++ toks("f", 10)).mkString(" "),
      3L -> (toks("g", 10) ++ repeat40 ++ toks("h", 10)).mkString(" "))
    val spans = Dedup.substringDupSpans(d, 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_toks"))).sorted
    // the 60-token block spans positions 11..70 in doc 0, 6..65 in
    // doc 1 — ONE maximal span each, the full repeat, nothing more;
    // the 40-token block (< minLen) must produce nothing at all
    assert(spans.toSeq === Seq((0L, 11L, 70L, 60L), (1L, 6L, 65L, 60L)))
  }

  test("within-document repetition is duplication: a doc repeating its own block flags") {
    val block = toks("x", 8)
    val d = docs(
      0L -> (block ++ toks("mid", 3) ++ block).mkString(" "),
      1L -> toks("other", 20).mkString(" "))
    val spans = Dedup.substringDupSpans(d, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).sorted
    assert(spans.toSeq === Seq((0L, 1L, 8L), (0L, 12L, 19L)))
  }

  test("adjacent coverage merges into one maximal span") {
    // two distinct 8-token repeats sitting back-to-back in doc 0:
    // coverage [1,8] and [9,16] merge to the single maximal [1,16]
    val r1 = toks("p", 8)
    val r2 = toks("q", 8)
    val d = docs(
      0L -> (r1 ++ r2).mkString(" "),
      1L -> (r1 ++ toks("u", 10)).mkString(" "),
      2L -> (toks("v", 10) ++ r2).mkString(" "))
    val spans = Dedup.substringDupSpans(d, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).sorted
    assert(spans.toSeq ===
      Seq((0L, 1L, 16L), (1L, 1L, 8L), (2L, 11L, 18L)))
  }

  test("decontaminate_spans: exactly the benchmark-shared block is spanned; sub-n overlap is invisible") {
    import graft.operators.TextOps
    val shared6 = toks("bench", 6)
    val tiny3 = toks("tiny", 3)
    val train = docs(
      0L -> (toks("a", 5) ++ shared6 ++ toks("b", 4)).mkString(" "),
      1L -> (toks("c", 5) ++ tiny3 ++ toks("d", 5)).mkString(" "))
    val benchmark = docs(
      100L -> (toks("x", 2) ++ shared6 ++ tiny3).mkString(" "))
    val spans = TextOps.decontaminateSpans(train, benchmark, 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_toks"))).sorted
    // the 6-token shared block sits at positions 6..11 of doc 0: its
    // three 4-gram windows (starts 6,7,8) merge to exactly [6, 11];
    // doc 1's 3-token overlap can't fill a 4-gram — no span at all
    assert(spans.toSeq === Seq((0L, 6L, 11L, 6L)))
  }

  test("corpus_diversity separates a templated source from a diverse one") {
    import spark.implicits._
    import graft.operators.TextOps
    val tpl = "spark row spark row" // 4 toks, 2 types; bigrams: 3, types 2
    val rows = Seq(
      (0L, tpl, "tpl"), (1L, tpl, "tpl"),
      (2L, "alpha beta gamma delta", "div")) // all unique
    val out = TextOps.corpusDiversity(
        rows.toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Double]("ttr"), r.getAs[Long]("n_bigram_types"),
        r.getAs[Double]("distinct_2"))).sortBy(_._1)
    assert(out(0) === (("div", 1L, 4L, 4L, 1.0, 3L, 1.0)))
    // templated: 8 tokens / 2 types = 0.25; 6 bigrams / 2 distinct
    assert(out(1) === (("tpl", 2L, 8L, 2L, 0.25, 2L, r3(2.0 / 6.0))))
  }

  private def r3(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0

  test("stored gram index: probe spans equal the broadcast path; missing meta fails eagerly") {
    import graft.operators.{Dedup, TextOps}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val delta = docs.where(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    Dedup.writeSubstringIndex(ref, 6, "graft_subidx_spec", 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).sorted.toSeq
    val stored = rows(Dedup.substringSpansAgainstIndex(delta, "graft_subidx_spec"))
    val broadcastPath = rows(TextOps.decontaminateSpans(delta, ref, 6))
    assert(stored === broadcastPath && stored.nonEmpty)
    val err = intercept[IllegalArgumentException] {
      Dedup.substringSpansAgainstIndex(delta, "graft_subidx_missing")
    }
    assert(err.getMessage.contains("writeSubstringIndex"))
  }

  test("gram-index append: two-batch net refcounts equal the one-shot build") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ref = docs.where(col("doc_id") % 2 === 1)
    Dedup.writeSubstringIndex(ref, 6, "graft_subidx_one", 4)
    Dedup.writeSubstringIndex(ref.where(col("doc_id") < 250), 6, "graft_subidx_two", 4)
    Dedup.appendSubstringIndex(ref.where(col("doc_id") >= 250), "graft_subidx_two")
    // refcounts are additive over disjoint doc batches: the two-batch
    // store may hold one row per generation, but SUM per gram must
    // equal the one-shot build exactly
    def refs(t: String) = spark.table(s"${t}_grams")
      .groupBy(col("gram")).agg(org.apache.spark.sql.functions.sum(col("n_refs")).as("n"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"))).sorted.toSeq
    assert(refs("graft_subidx_two") === refs("graft_subidx_one"))
  }

  /** Takedown fixture: the shared block is witnessed by BOTH reference
    * docs, the only-block by just the removed one — the refcount edge
    * case a doc-attribution-free store must still decide exactly.
    */
  private def takedownFixture(table: String): org.apache.spark.sql.DataFrame = {
    val s = toks("s", 4).mkString(" ")
    val o = toks("o", 4).mkString(" ")
    val ref = docs(
      1L -> s"a0 a1 $s a2",
      3L -> s"b0 $s $o b1")
    Dedup.writeSubstringIndex(ref, 4, table, 2)
    docs(0L -> s"p0 $s p1 $o p2")
  }

  private def spanRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
      r.getAs[Long]("span_end"))).sorted.toSeq

  test("gram-index takedown: a span whose only witness is removed stops flagging; a surviving witness keeps it") {
    val probe = takedownFixture("graft_subidx_tdspec")
    val s = toks("s", 4).mkString(" ")
    val o = toks("o", 4).mkString(" ")
    // before: both blocks flag (positions 2-5 and 7-10 of the probe)
    assert(spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_tdspec"))
      === Seq((0L, 2L, 5L), (0L, 7L, 10L)))
    // remove doc 3: the only-block loses its last witness; the shared
    // block keeps doc 1 (net refcount 2 − 1 = 1 > 0) and still flags
    Dedup.deleteFromSubstringIndex(docs(3L -> s"b0 $s $o b1"), "graft_subidx_tdspec")
    val after = spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_tdspec"))
    assert(after === Seq((0L, 2L, 5L)))
    // re-deleting the same doc is idempotent while tombstones live
    Dedup.deleteFromSubstringIndex(docs(3L -> s"b0 $s $o b1"), "graft_subidx_tdspec")
    assert(spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_tdspec"))
      === after)
  }

  test("gram-index compaction: probe answers are identical before and after; generations collapse") {
    val probe = takedownFixture("graft_subidx_ccspec")
    val s = toks("s", 4).mkString(" ")
    val o = toks("o", 4).mkString(" ")
    Dedup.deleteFromSubstringIndex(docs(3L -> s"b0 $s $o b1"), "graft_subidx_ccspec")
    val masked = spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_ccspec"))
    Dedup.compactSubstringIndex("graft_subidx_ccspec")
    assert(spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_ccspec"))
      === masked)
    assert(!spark.catalog.tableExists("graft_subidx_ccspec_stombstones"),
      "compaction must drop the tombstones")
    val g = spark.table("graft_subidx_ccspec_grams").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_refs")))
    assert(g.map(_._1).distinct.length === g.length,
      "compaction must collapse generations to one row per gram")
    assert(g.forall(_._2 > 0), "compacted refcounts must be positive")
    // a later append re-witnessing a removed gram makes it flag again
    // (refcounts stay additive across the compacted generation)
    Dedup.appendSubstringIndex(docs(5L -> s"c0 $o c1"), "graft_subidx_ccspec")
    assert(spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_ccspec"))
      === Seq((0L, 2L, 5L), (0L, 7L, 10L)))
  }

  test("takedown contract: never-indexed and post-compaction filings are rejected; overlapping appends are rejected; the ledger follows append and compact") {
    import graft.operators.Dedup
    val probe = takedownFixture("graft_subidx_ctspec") // indexes docs 1 and 3
    val s = toks("s", 4).mkString(" ")
    val o = toks("o", 4).mkString(" ")
    // tombstoning a doc the index never saw would decrement grams it
    // never contributed — a directed error, not a silent under-count
    val e1 = intercept[IllegalArgumentException] {
      Dedup.deleteFromSubstringIndex(docs(9L -> s"z0 $s z1"), "graft_subidx_ctspec")
    }
    assert(e1.getMessage.contains("not indexed"))
    // re-appending an indexed doc would double-count its grams (the
    // phantom-witness takedown failure) — a directed error
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendSubstringIndex(docs(1L -> s"a0 a1 $s a2"), "graft_subidx_ctspec")
    }
    assert(e2.getMessage.contains("already indexed"))
    // compaction removes folded docs from the ledger: re-deleting the
    // same doc AFTER the fold is rejected (its grams are physically
    // gone — a second decrement is exactly the negative-refcount bug
    // the ledger exists to make impossible)
    Dedup.deleteFromSubstringIndex(docs(3L -> s"b0 $s $o b1"), "graft_subidx_ctspec")
    Dedup.compactSubstringIndex("graft_subidx_ctspec")
    val e3 = intercept[IllegalArgumentException] {
      Dedup.deleteFromSubstringIndex(docs(3L -> s"b0 $s $o b1"), "graft_subidx_ctspec")
    }
    assert(e3.getMessage.contains("not indexed"))
    // the ledger follows append: a NEW doc appends cleanly, is then
    // deletable, and the masked probe ends exactly at the survivor set
    Dedup.appendSubstringIndex(docs(5L -> s"c0 $o c1"), "graft_subidx_ctspec")
    Dedup.deleteFromSubstringIndex(docs(5L -> s"c0 $o c1"), "graft_subidx_ctspec")
    assert(spanRows(Dedup.substringSpansAgainstIndex(probe, "graft_subidx_ctspec"))
      === Seq((0L, 2L, 5L)))
  }

  test("strip removes exactly the spanned tokens; clean and all-dup docs survive") {
    val block = toks("x", 8)
    val d = docs(
      0L -> (toks("a", 4) ++ block ++ toks("b", 3)).mkString(" "),
      1L -> block.mkString(" "), // the whole doc IS the repeat
      2L -> toks("clean", 12).mkString(" "))
    val out = Dedup.substringStrip(d, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("n_removed"), r.getAs[String]("text_clean")))
      .sortBy(_._1)
    assert(out(0) === ((0L, 15L, 8L,
      (toks("a", 4) ++ toks("b", 3)).mkString(" "))))
    assert(out(1) === ((1L, 8L, 8L, ""))) // all-dup → empty, not dropped
    assert(out(2) === ((2L, 12L, 0L, toks("clean", 12).mkString(" "))))
  }
}
