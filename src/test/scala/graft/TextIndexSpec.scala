package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Stored inverted-index (BM25) lifecycle contracts — the sixth index
  * family under the store discipline: stored-vs-recompute byte parity,
  * append ≡ one-shot over disjoint batches (and a directed error on
  * overlap), takedown shifting CANDIDATES AND STATS (BM25 is
  * corpus-relative — a removed doc must stop biasing idf/avgdl, so the
  * masked answer equals the survivor-corpus one-shot), idempotent
  * re-delete while tombstones live, never-indexed/post-compaction
  * filings rejected, and compaction answering identically to the mask.
  */
class TextIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Eight docs over a small vocabulary; "rare" appears only in docs
    * 1 and 5, "common" in all — so idf separates them and any stats
    * drift (N, avgdl, df) moves scores visibly.
    */
  private def corpus: DataFrame = docs(
    0L -> "common alpha beta gamma",
    1L -> "rare common alpha alpha",
    2L -> "common beta beta beta gamma gamma",
    3L -> "common gamma",
    4L -> "common alpha beta",
    5L -> "rare rare common beta",
    6L -> "common alpha gamma gamma",
    7L -> "common beta gamma alpha beta")

  private def rows(df: DataFrame): Seq[(Long, Double, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
      r.getAs[Long]("rank"))).toSeq.sortBy(_._3)

  test("stored query is byte-equal to the one-shot bm25 on the same corpus") {
    val c = corpus
    TextOps.writeTextIndex(c, "graft_txidx_par", 4)
    val stored = rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_par",
      Seq("rare", "beta"), 5))
    val oneShot = rows(TextOps.bm25(c, Seq("rare", "beta"), 5))
    assert(stored === oneShot)
    assert(stored.nonEmpty)
  }

  test("append over disjoint batches is equivalent to the one-shot build") {
    val c = corpus
    TextOps.writeTextIndex(c, "graft_txidx_one", 4)
    TextOps.writeTextIndex(c.where(col("doc_id") < 4), "graft_txidx_two", 4)
    TextOps.appendTextIndex(c.where(col("doc_id") >= 4), "graft_txidx_two")
    assert(rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_two", Seq("rare", "beta"), 5))
      === rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_one", Seq("rare", "beta"), 5)))
    // the stores themselves agree row-for-row, not just this query
    val one = spark.table("graft_txidx_one_postings")
      .collect().map(_.toSeq).toSet
    val two = spark.table("graft_txidx_two_postings")
      .collect().map(_.toSeq).toSet
    assert(two === one)
  }

  test("re-appending an already-indexed doc is a directed error") {
    TextOps.writeTextIndex(corpus, "graft_txidx_ovl", 4)
    val err = intercept[IllegalArgumentException] {
      TextOps.appendTextIndex(docs(3L -> "common gamma extra"), "graft_txidx_ovl")
    }
    assert(err.getMessage.contains("already indexed"))
  }

  test("takedown masks candidates AND stats: answers equal the survivor-corpus one-shot") {
    val c = corpus
    TextOps.writeTextIndex(c, "graft_txidx_td", 4)
    val before = rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_td",
      Seq("rare", "beta"), 8))
    // doc 5 is the top "rare" hit before the takedown
    assert(before.map(_._1).contains(5L))
    TextOps.deleteFromTextIndex(docs(5L -> "ignored"), "graft_txidx_td")
    val after = rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_td",
      Seq("rare", "beta"), 8))
    // the removed doc is gone, and every surviving score equals the
    // one-shot bm25 over the survivor corpus — stats shifted too
    // (df("rare") 2→1, N 8→7, avgdl moved), not just the row mask
    assert(!after.map(_._1).contains(5L))
    assert(after === rows(TextOps.bm25(c.where(col("doc_id") =!= 5L),
      Seq("rare", "beta"), 8)))
    // idempotent while tombstones live
    TextOps.deleteFromTextIndex(docs(5L -> "ignored"), "graft_txidx_td")
    assert(rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_td",
      Seq("rare", "beta"), 8)) === after)
  }

  test("never-indexed takedown filings are a directed error") {
    TextOps.writeTextIndex(corpus, "graft_txidx_unk", 4)
    val err = intercept[IllegalArgumentException] {
      TextOps.deleteFromTextIndex(docs(99L -> "x"), "graft_txidx_unk")
    }
    assert(err.getMessage.contains("not indexed"))
  }

  test("compaction answers identically, drops tombstones, and rejects re-deleting folded docs") {
    val c = corpus
    TextOps.writeTextIndex(c, "graft_txidx_cmp", 4)
    TextOps.deleteFromTextIndex(docs(5L -> "ignored", 2L -> "ignored"),
      "graft_txidx_cmp")
    val masked = rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_cmp",
      Seq("rare", "beta"), 8))
    TextOps.compactTextIndex("graft_txidx_cmp")
    assert(!spark.catalog.tableExists("graft_txidx_cmp_ttombstones"))
    assert(rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_cmp",
      Seq("rare", "beta"), 8)) === masked)
    // folded docs left the _dlens ledger: a re-delete is rejected
    val err = intercept[IllegalArgumentException] {
      TextOps.deleteFromTextIndex(docs(5L -> "ignored"), "graft_txidx_cmp")
    }
    assert(err.getMessage.contains("not indexed"))
  }

  test("delta scoring: tonight's docs score under the INDEX's pinned statistics") {
    // indexed corpus: N = 2, avgdl = 2, df(rare) = 1
    TextOps.writeTextIndex(docs(0L -> "rare common", 1L -> "common common"),
      "graft_txidx_delta", 2)
    // delta doc 10 "rare rare": tf = 2, dl = 2 under pinned stats →
    // idf = ln(1 + (2 − 1 + 0.5)/1.5) = ln 2; score =
    // ln2 · (2·2.2)/(2 + 1.2·(0.25 + 0.75·2/2)) = ln2 · 4.4/3.2 ≈ 0.953
    // delta doc 11 matches no term → excluded
    val out = TextOps.bm25ScoreDelta(
        docs(10L -> "rare rare", 11L -> "common"),
        "graft_txidx_delta", Seq("rare"), 5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Long]("rank"))).toSeq
    assert(out === Seq((10L, 0.953, 1L)))
    // an index-unseen term gets df = 0 (max idf), not an error
    val unseen = TextOps.bm25ScoreDelta(docs(10L -> "novel word"),
        "graft_txidx_delta", Seq("novel"), 5)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(unseen === Seq(10L))
  }

  test("hybrid retrieval from stores is byte-equal to the recompute") {
    val spark0 = spark
    val docs = Tables.documents(spark0, "/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark0, "/root/testdata/sf0.001")
    TextOps.writeTextIndex(docs, "graft_txidx_hyb", 4)
    graft.operators.Similarity.writeKnnGraph(emb, 16, 4, "graft_knng_hyb", 4, 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"))).sorted.toSeq
    val stored = rows(TextOps.hybridRrfStored(spark0, "graft_txidx_hyb",
      "graft_knng_hyb", Seq("hash", "join", "vector"), 20, 10))
    assert(stored === rows(TextOps.hybridRrf(docs, emb,
      Seq("hash", "join", "vector"), 20, 10)))
    assert(stored.size === 10)
  }

  test("querying a never-built index is a directed error") {
    val err = intercept[IllegalArgumentException] {
      TextOps.bm25AgainstIndex(spark, "graft_txidx_missing", Seq("x"), 3)
    }
    assert(err.getMessage.contains("writeTextIndex"))
  }

  test("a rebuild under the same name clears stale tombstones") {
    TextOps.writeTextIndex(corpus, "graft_txidx_rebuild", 4)
    TextOps.deleteFromTextIndex(docs(1L -> "x", 5L -> "x"), "graft_txidx_rebuild")
    // rebuild over the SAME table name: the old generation's mask must
    // not survive to hide the freshly-indexed docs 1 and 5
    TextOps.writeTextIndex(corpus, "graft_txidx_rebuild", 4)
    assert(!spark.catalog.tableExists("graft_txidx_rebuild_ttombstones"))
    assert(rows(TextOps.bm25AgainstIndex(spark, "graft_txidx_rebuild",
      Seq("rare", "beta"), 5)) === rows(TextOps.bm25(corpus, Seq("rare", "beta"), 5)))
  }

  test("duplicate query terms are a directed error on every index-scoring path") {
    TextOps.writeTextIndex(corpus, "graft_txidx_dupterm", 4)
    val e1 = intercept[IllegalArgumentException] {
      TextOps.bm25AgainstIndex(spark, "graft_txidx_dupterm", Seq("rare", "rare"), 3)
    }
    assert(e1.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException] {
      TextOps.bm25ScoreDelta(docs(10L -> "rare"), "graft_txidx_dupterm",
        Seq("beta", "rare", "beta"), 3)
    }
    assert(e2.getMessage.contains("duplicate"))
    val e3 = intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.bm25TriageStreamBatch(
        docs(10L -> "rare").withColumn("ts", current_timestamp()),
        "graft_txidx_dupterm", Seq("rare", "rare"), 0.0)
    }
    assert(e3.getMessage.contains("duplicate"))
  }

  test("streaming triage against a fully-tombstoned index is a directed error, not an NPE") {
    TextOps.writeTextIndex(docs(0L -> "a b", 1L -> "c d"), "graft_txidx_empty", 2)
    TextOps.deleteFromTextIndex(docs(0L -> "x", 1L -> "x"), "graft_txidx_empty")
    val err = intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.bm25TriageStreamBatch(
        docs(10L -> "a").withColumn("ts", current_timestamp()),
        "graft_txidx_empty", Seq("a"), 0.0)
    }
    assert(err.getMessage.contains("no live docs"))
  }
}
