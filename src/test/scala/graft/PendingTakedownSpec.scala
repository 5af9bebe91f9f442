package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextOps}

/** The PENDING-TAKEDOWN × APPEND interplay, pinned for EVERY stored
  * lifecycle family (r15 pinned it for the routed graph store only):
  * a takedown is filed, then a delta lands BEFORE compaction — the
  * race a nightly pipeline actually runs. Contract per family:
  * (1) the mask still applies to the old generation after the append,
  * (2) the new batch serves immediately,
  * (3) compaction folds the tombstones and the store answers as the
  *     survivor one-shot (where the family's contract is survivor
  *     parity) or exactly as the masked store (where artifacts are
  *     pinned — the ANN index keeps its trained codebooks, so a
  *     survivor REBUILD is explicitly NOT the contract there).
  * The daily feature store is append-only (no tombstone surface), so
  * it has no interplay to pin — recorded here so the family sweep is
  * complete.
  */
class PendingTakedownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("text index: pending takedown survives the append; compaction equals the survivor one-shot") {
    val removed = col("doc_id") % 10 === 3 && col("doc_id") < 300
    TextOps.writeTextIndex(docs.where(col("doc_id") < 300), "graft_pend_txt", 4)
    TextOps.deleteFromTextIndex(docs.where(removed).select(col("doc_id")),
      "graft_pend_txt")
    TextOps.appendTextIndex(docs.where(col("doc_id") >= 300), "graft_pend_txt")
    def answers(t: String) = TextOps.bm25AgainstIndex(spark, t,
        Seq("hash", "join", "vector"), 10)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).sorted.toSeq
    // survivor one-shot: old survivors ∪ the whole delta
    TextOps.writeTextIndex(docs.where(!removed), "graft_pend_txt_one", 4)
    val masked = answers("graft_pend_txt")
    assert(masked.nonEmpty)
    assert(!masked.exists { case (_, d, _) => d % 10 == 3 && d < 300 },
      "a tombstoned doc must not score after the append")
    assert(masked.exists(_._2 >= 300), "the delta must serve immediately")
    // BM25 is corpus-relative: stats (N, avgdl, df) must already sit
    // on the survivor corpus, so the masked answers equal the
    // survivor one-shot EVEN BEFORE compaction
    assert(masked === answers("graft_pend_txt_one"))
    TextOps.compactTextIndex("graft_pend_txt")
    assert(!spark.catalog.tableExists("graft_pend_txt_ttombstones"))
    assert(answers("graft_pend_txt") === answers("graft_pend_txt_one"))
    def rows(t: String, suf: String, cols: Seq[String]) =
      spark.table(s"${t}_$suf").collect()
        .map(r => cols.map(c => r.get(r.fieldIndex(c))).mkString("|")).sorted.toSeq
    for ((suf, cols) <- Seq(("postings", Seq("term", "doc_id", "tf", "dl")),
        ("dlens", Seq("doc_id", "dl"))))
      assert(rows("graft_pend_txt", suf, cols)
        === rows("graft_pend_txt_one", suf, cols), suf)
  }

  test("band index: pending takedown survives the append; compaction equals the survivor one-shot") {
    val isRef = col("doc_id") % 2 === 0
    val removed = col("doc_id") % 20 === 0 && col("doc_id") < 300
    Dedup.writeBandIndex(docs.where(isRef && col("doc_id") < 300), 16, 2,
      "graft_pend_band", 4)
    Dedup.deleteFromBandIndex(docs.where(removed).select(col("doc_id")),
      "graft_pend_band")
    Dedup.appendBandIndex(docs.where(isRef && col("doc_id") >= 300), 16, 2,
      "graft_pend_band", 4)
    def hits(t: String) = Dedup.crossDupAgainstIndex(
        docs.where(col("doc_id") % 2 === 1), t, 16, 2, 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("ref_dups"),
        r.getAs[Long]("dup_of"), r.getAs[Int]("flagged"))).sorted.toSeq
    Dedup.writeBandIndex(docs.where(isRef && !removed), 16, 2,
      "graft_pend_band_one", 4)
    val masked = hits("graft_pend_band")
    assert(masked.exists(_._4 == 1), "fixture must flag at least one dup")
    assert(!masked.exists { case (_, _, ref, _) =>
      ref >= 0 && ref % 20 == 0 && ref < 300 },
      "a tombstoned reference doc must not witness any verdict")
    assert(masked === hits("graft_pend_band_one"))
    Dedup.compactBandIndex("graft_pend_band")
    assert(!spark.catalog.tableExists("graft_pend_band_tombstones"))
    assert(hits("graft_pend_band") === hits("graft_pend_band_one"))
    def rows(t: String, suf: String) = spark.table(s"${t}_$suf").collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    for (suf <- Seq("bands", "sigs"))
      assert(rows("graft_pend_band", suf) === rows("graft_pend_band_one", suf), suf)
  }

  test("gram index: pending takedown survives the append; compaction answers as the survivor one-shot") {
    val removed = col("doc_id") % 10 === 1 && col("doc_id") < 300
    Dedup.writeSubstringIndex(docs.where(col("doc_id") < 300), 8,
      "graft_pend_gram", 4)
    Dedup.deleteFromSubstringIndex(docs.where(removed), "graft_pend_gram")
    Dedup.appendSubstringIndex(docs.where(col("doc_id") >= 300), "graft_pend_gram")
    def spans(t: String) = Dedup.substringSpansAgainstIndex(
        docs.where(col("doc_id") % 2 === 0), t)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    Dedup.writeSubstringIndex(docs.where(!removed), 8, "graft_pend_gram_one", 4)
    val masked = spans("graft_pend_gram")
    assert(masked.nonEmpty)
    assert(masked === spans("graft_pend_gram_one"),
      "masked refcounts must answer as the survivor corpus before compaction")
    Dedup.compactSubstringIndex("graft_pend_gram")
    assert(spans("graft_pend_gram") === spans("graft_pend_gram_one"))
  }

  test("hier graph store: pending takedown survives the append; compaction equals the survivor one-shot") {
    val removed = col("vec_id") % 10 === 7 && col("vec_id") >= 16 &&
      col("vec_id") < 250
    Similarity.writeKnnGraphHier(emb.where(col("vec_id") < 250), 16, 4,
      "graft_pend_hier", 4)
    Similarity.deleteFromKnnGraph(emb.where(removed).select(col("vec_id")),
      "graft_pend_hier")
    Similarity.appendKnnGraphHier(emb.where(col("vec_id") >= 250),
      "graft_pend_hier")
    val vids = Similarity.annGraphSearchHierStored(spark, "graft_pend_hier",
        5, 8, 2, 5)
      .collect().map(_.getAs[Long]("vid")).toSet
    assert(!vids.exists(v => v % 10 == 7 && v >= 16 && v < 250),
      "no tombstoned node may serve from any level after the append")
    Similarity.compactKnnGraphHier("graft_pend_hier")
    Similarity.writeKnnGraphHier(emb.where(!removed), 16, 4,
      "graft_pend_hier_one", 4)
    def edges(t: String, l: String) = spark.table(s"${t}_${l}_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("nbr"),
        r.getAs[Double]("cos"))).sorted.toSeq
    for (l <- Seq("l0", "l1"))
      assert(edges("graft_pend_hier", l) === edges("graft_pend_hier_one", l), l)
    assert(spark.table("graft_pend_hier_hmeta").head().getAs[Long]("entry")
      === spark.table("graft_pend_hier_one_hmeta").head().getAs[Long]("entry"))
  }

  test("media index: pending takedown survives the append; compaction equals the survivor one-shot") {
    import graft.sources.Multimodal
    val m = Multimodal.ingestMixed(docs)
    val removed = col("media_id") % 10 === 3 && col("media_id") < 300
    Multimodal.writeMediaIndex(m.where(col("media_id") < 300), "graft_pend_media", 4)
    Multimodal.deleteFromMediaIndex(m.where(removed).select(col("media_id")),
      "graft_pend_media")
    Multimodal.appendMediaIndex(m.where(col("media_id") >= 300), "graft_pend_media")
    def verdicts(t: String) = Multimodal.mediaDedupAgainstIndex(spark, t)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[String]("digest"),
        r.getAs[Long]("n_copies"), r.getAs[Int]("keep"))).sorted.toSeq
    def budget(t: String) = Multimodal.mediaBudgetAgainstIndex(spark, t, 4000L)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("stream_pos")))
      .sorted.toSeq
    val masked = verdicts("graft_pend_media")
    assert(!masked.exists { case (id, _, _, _) => id % 10 == 3 && id < 300 },
      "a tombstoned media item must not verdict after the append")
    assert(masked.exists(_._1 >= 300), "the delta must serve immediately")
    // re-appending a pending-takedown id is the directed ledger error
    // (it still sits in _media — resurrecting it would be ambiguous)
    val err = intercept[IllegalArgumentException] {
      Multimodal.appendMediaIndex(m.where(col("media_id") === 3L), "graft_pend_media")
    }
    assert(err.getMessage.contains("already indexed"))
    // survivor one-shot parity, before AND after compaction (digest
    // rows are independent — nothing trained, nothing pinned)
    Multimodal.writeMediaIndex(m.where(!removed), "graft_pend_media_one", 4)
    assert(masked === verdicts("graft_pend_media_one"))
    assert(budget("graft_pend_media") === budget("graft_pend_media_one"))
    Multimodal.compactMediaIndex("graft_pend_media")
    assert(!spark.catalog.tableExists("graft_pend_media_mtombstones"))
    assert(verdicts("graft_pend_media") === verdicts("graft_pend_media_one"))
    assert(budget("graft_pend_media") === budget("graft_pend_media_one"))
    // the stale-tombstone rebuild rule holds for the media family too
    Multimodal.deleteFromMediaIndex(m.where(col("media_id") === 5L)
      .select(col("media_id")), "graft_pend_media")
    Multimodal.writeMediaIndex(m, "graft_pend_media", 4)
    assert(!spark.catalog.tableExists("graft_pend_media_mtombstones"))
  }

  test("ANN index: pending takedown survives the append; compaction leaves probe answers bit-unchanged") {
    val removed = col("vec_id") % 10 === 9 && col("vec_id") >= 16 &&
      col("vec_id") < 250
    Similarity.writeAnnIndex(emb.where(col("vec_id") < 250), 16, 16, 4,
      "graft_pend_ann", 4)
    Similarity.deleteFromAnnIndex(emb.where(removed).select(col("vec_id")),
      "graft_pend_ann")
    Similarity.appendAnnIndex(emb.where(col("vec_id") >= 250), "graft_pend_ann")
    def probe() = Similarity.annIvfPqAgainstIndex(
        emb.where(col("vec_id") < 5), "graft_pend_ann", 5, 2)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    def probeVids() = Similarity.annIvfPqAgainstIndex(
        emb.where(col("vec_id") < 5), "graft_pend_ann", 5, 2)
      .collect().map(_.getAs[Long]("vid")).toSet
    val vids = probeVids()
    assert(!vids.exists(v => v % 10 == 9 && v >= 16 && v < 250),
      "a tombstoned vector must not probe after the append")
    assert(vids.exists(_ >= 250), "the delta must probe immediately")
    // the ANN contract is PINNED ARTIFACTS (centroids/codebooks train
    // once; a survivor rebuild would re-train them), so compaction
    // parity is masked-answers-unchanged, not one-shot table equality
    val before = probe()
    Similarity.compactAnnIndex("graft_pend_ann")
    assert(probe() === before)
  }
}
