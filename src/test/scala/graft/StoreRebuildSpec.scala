package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** The stale-tombstone lifecycle rule, FAMILY-WIDE (r16 ADVICE): every
  * stored-index builder that overwrites its data tables must also
  * clear the previous generation's takedown ledger — a same-name
  * rebuild after a takedown would otherwise silently mask
  * freshly-indexed docs/vectors (the exact failure the writeTextIndex
  * rebuild test pinned in r16; this spec extends it to the band,
  * substring, flat/routed/hier graph and ANN families).
  */
class StoreRebuildSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private lazy val corpus = docs(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "alpha beta gamma delta epsilon zeta",
    3L -> "one two three four five six seven eight",
    4L -> "the quick brown fox jumps over the lazy dog",
    5L -> "alpha beta gamma delta epsilon eta")

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("band index rebuild clears stale tombstones; probe sees re-indexed docs") {
    Dedup.writeBandIndex(corpus, 16, 2, "graft_bidx_rb", 4)
    Dedup.deleteFromBandIndex(corpus.where(col("doc_id") === 1L)
      .select(col("doc_id")), "graft_bidx_rb")
    Dedup.writeBandIndex(corpus, 16, 2, "graft_bidx_rb", 4)
    assert(!spark.catalog.tableExists("graft_bidx_rb_tombstones"))
    // doc 2 is an exact dup of the re-indexed doc 1 — the probe must
    // flag it again (a stale mask would hide doc 1 from the bucket join)
    val hit = Dedup.crossDupAgainstIndex(docs(99L -> corpus.where(col("doc_id") === 2L)
        .select("text").head().getString(0)), "graft_bidx_rb", 16, 2, 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("flagged"))).toMap
    assert(hit(99L) === 1)
  }

  test("substring index rebuild clears stale tombstones") {
    Dedup.writeSubstringIndex(corpus, 8, "graft_sidx_rb", 4)
    Dedup.deleteFromSubstringIndex(corpus.where(col("doc_id") <= 2L), "graft_sidx_rb")
    Dedup.writeSubstringIndex(corpus, 8, "graft_sidx_rb", 4)
    assert(!spark.catalog.tableExists("graft_sidx_rb_stombstones"))
  }

  test("flat kNN graph rebuild clears stale tombstones; stored walk = recompute") {
    Similarity.writeKnnGraph(emb, 16, 4, "graft_knng_rb", 4, 2)
    Similarity.deleteFromKnnGraph(
      emb.where(col("vec_id") % 7 === 3 && col("vec_id") >= 16)
        .select(col("vec_id")), "graft_knng_rb")
    Similarity.writeKnnGraph(emb, 16, 4, "graft_knng_rb", 4, 2)
    assert(!spark.catalog.tableExists("graft_knng_rb_gtombstones"))
    def rows(df: DataFrame) = df.collect().map(r => (r.getAs[Long]("qid"),
      r.getAs[Long]("rank"), r.getAs[Long]("vid"))).sorted.toSeq
    assert(rows(Similarity.annGraphSearchStored(spark, "graft_knng_rb", 3, 8, 2, 4)) ===
      rows(Similarity.annGraphSearch(emb, 16, 4, 3, 8, 2, 4)))
  }

  test("routed kNN graph rebuild clears stale tombstones") {
    Similarity.writeKnnGraphRouted(emb, 16, 3, 15, 16, 1, "graft_knngr_rb", 4, 2)
    Similarity.deleteFromKnnGraph(
      emb.where(col("vec_id") === 20L).select(col("vec_id")), "graft_knngr_rb")
    Similarity.writeKnnGraphRouted(emb, 16, 3, 15, 16, 1, "graft_knngr_rb", 4, 2)
    assert(!spark.catalog.tableExists("graft_knngr_rb_gtombstones"))
  }

  test("hier graph rebuild clears the root AND per-level stale tombstones") {
    Similarity.writeKnnGraphHier(emb, 16, 4, "graft_knngh_rb", 4)
    // a root filing masks every level (deleteFromKnnGraph on the root)
    Similarity.deleteFromKnnGraph(
      emb.where(col("vec_id") === 25L).select(col("vec_id")), "graft_knngh_rb")
    Similarity.writeKnnGraphHier(emb, 16, 4, "graft_knngh_rb", 4)
    assert(!spark.catalog.tableExists("graft_knngh_rb_gtombstones"))
    assert(!spark.catalog.tableExists("graft_knngh_rb_l0_gtombstones"))
    assert(!spark.catalog.tableExists("graft_knngh_rb_l1_gtombstones"))
  }

  test("ANN index rebuild clears stale tombstones") {
    Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_ann_rb", 4)
    Similarity.deleteFromAnnIndex(
      emb.where(col("vec_id") === 30L).select(col("vec_id")), "graft_ann_rb")
    Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_ann_rb", 4)
    assert(!spark.catalog.tableExists("graft_ann_rb_tombstones"))
  }
}
