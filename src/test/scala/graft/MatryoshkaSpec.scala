package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Matryoshka two-stage serving: prefix-dim shortlist, full-dim exact
  * rerank. The contracts that matter: (1) the rerank actually
  * overrides prefix-order when the tail disagrees, (2) a full-width
  * prefix degenerates to exact search (recall exactly 1), (3) the
  * honest untrained-embedding recall at the gate's 16/64 prefix.
  */
class MatryoshkaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  val dir = "/root/testdata/sf0.001"

  test("full-dim rerank demotes a prefix-perfect decoy whose tail disagrees") {
    import spark.implicits._
    // query 0 = [1,0 | 0,0]; decoy 1 matches the prefix exactly but
    // its tail points away (full cos 1/√10 ≈ 0.316); true 2 is
    // slightly off in the prefix but fully aligned (cos 0.976).
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, -3.0, 0.0)),
      (2L, Seq(0.9, 0.2, 0.0, 0.0)),
      (3L, Seq(0.1, -1.0, 0.5, 0.5)))
      .toDF("vec_id", "embedding")
    // stage-1-only (shortlist = k = 1): the decoy wins on the prefix
    val prefixOnly = Similarity.annMatryoshka(emb, 2, 1, 1, 1).collect().head
    assert(prefixOnly.getAs[Long]("vid") === 1L)
    // with room to shortlist both, the exact rerank flips the order
    val reranked = Similarity.annMatryoshka(emb, 2, 1, 2, 2).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(reranked.map(_.getAs[Long]("vid")).toSeq === Seq(2L, 1L))
    assert(reranked.head.getAs[Double]("cos") === 0.976)
  }

  test("a full-width prefix degenerates to exact search: recall exactly 1") {
    val emb = Tables.embeddings(spark, dir)
    val rec = Similarity.annMatryoshkaRecall(emb, 64, 5, 25, 5)
      .select(col("recall")).collect().map(_.getDouble(0))
    assert(rec.nonEmpty && rec.forall(_ === 1.0))
  }

  test("gate-shape recall at 16/64 prefix is recorded and bounded") {
    val emb = Tables.embeddings(spark, dir)
    val rec = Similarity.annMatryoshkaRecall(emb, 16, 5, 25, 5)
      .select(avg(col("recall"))).head().getDouble(0)
    info(s"matryoshka 16/64 avg recall = $rec")
    // an untrained random embedding spreads information uniformly, so
    // the prefix carries ~1/4 of it — expect a mid recall, not ~1;
    // the shortlist (5x over-fetch) keeps it off the floor
    assert(rec > 0.0 && rec <= 1.0)
  }
}
