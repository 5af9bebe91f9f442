package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The rotated-PQ tier's regime behavior: a Householder rotation is
  * orthogonal (metric-preserving), so any recall difference vs plain
  * PQ at the same codebook budget comes purely from how variance
  * lands on the fixed subspace grid — the OPQ argument.
  */
class RotatedPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def avgRecall(df: org.apache.spark.sql.DataFrame): Double = {
    val rows = df.collect()
    rows.map(_.getAs[Double]("recall")).sum / rows.length
  }

  test("rotation preserves geometry: rotated pairwise cosines match originals to rounding") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val e = (0L until 20L).map(i =>
      (i, Array.fill(16)(rng.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val origTop = Similarity.cosineTopK(e, 3, 5).orderBy("qid", "rank")
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rotTop = Similarity.cosineTopK(
      Similarity.rotateEmbeddings(e, 16), 3, 5).orderBy("qid", "rank")
      .select("qid", "vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // orthogonal map ⇒ identical neighbor RANKING (up to the r3
    // component rounding, which this corpus's margins dominate)
    assert(origTop === rotTop)
  }

  test("subspace-concentrated variance: rotation recovers recall plain PQ loses") {
    import spark.implicits._
    // ALL discriminative variance in subspace 0 (dims 0-3 of 16,
    // m = 4): plain PQ must describe every vector with subspace 0's
    // 8 codewords alone — the other three subspaces see ~constant
    // slices and carry no signal. The rotation smears the same
    // variance across all four subspaces → 4×8 codewords share the
    // load at the identical budget.
    val rng = new scala.util.Random(7)
    val e = (0L until 120L).map { i =>
      val v = Array.fill(16)(0.01f * rng.nextGaussian().toFloat)
      // 16 distinct ±1 corners in subspace 0 — more structure than 8
      // codewords can cover in one subspace
      (0 until 4).foreach(d =>
        v(d) = (if (rng.nextBoolean()) 1.0f else -1.0f) +
          0.05f * rng.nextGaussian().toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    val plain = avgRecall(Similarity.annPqRecall(e, 8, 4, 5, 5))
    val rot = avgRecall(Similarity.annPqRotatedRecall(e, 8, 4, 5, 5, dim = 16))
    assert(rot > plain,
      s"rotation should beat plain PQ on a subspace-skewed corpus: rot=$rot plain=$plain")
    // the LEARNED rotation maps the top-4 deflated components onto
    // axes 0/4/8/12 — one per subspace BY CONSTRUCTION, not by the
    // random direction's luck — so it must also beat plain PQ and at
    // least match the random reflection on this corpus
    val trained = avgRecall(
      Similarity.annPqRotatedTrainedRecall(e, 8, 4, 5, 5, p = 4, dim = 16))
    assert(trained > plain,
      s"learned rotation should beat plain PQ: trained=$trained plain=$plain")
    assert(trained >= rot,
      s"learned rotation should match-or-beat the random one: trained=$trained rot=$rot")
  }

  test("composed OPQ-IVFADC: rotation recovers recall the unrotated composition loses") {
    import spark.implicits._
    // same subspace-skewed corpus shape as the PQ-only regime test:
    // all discriminative variance in subspace 0 → the unrotated
    // composed tier inherits plain PQ's code starvation, the learned
    // rotation spreads it across the grid. The IVF stage prunes
    // identically-shaped cells in both, so the delta reads the PQ
    // term through the full composition.
    val rng = new scala.util.Random(23)
    val e = (0L until 120L).map { i =>
      val v = Array.fill(16)(0.01f * rng.nextGaussian().toFloat)
      (0 until 4).foreach(d =>
        v(d) = (if (rng.nextBoolean()) 1.0f else -1.0f) +
          0.05f * rng.nextGaussian().toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    val plain = avgRecall(Similarity.annIvfPqRecall(e, 4, 8, 4, 5, 5))
    val rotated = avgRecall(
      Similarity.annIvfPqRotatedTrainedRecall(e, 4, 8, 4, 2, 5, 5, p = 4, dim = 16))
    assert(rotated >= plain,
      s"composed rotation should match-or-beat the unrotated composition: rotated=$rotated plain=$plain")
    // recalls are honest fractions in [0, 1]
    assert(rotated >= 0.0 && rotated <= 1.0)
  }

  test("rotated-index append: raw append refuses, rotating append encodes byte-equal to the stored-chain build") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val b1 = emb.where(col("vec_id") < 200)
    val b2 = emb.where(col("vec_id") >= 200)
    Similarity.writeAnnIndexRotated(b1, 16, 16, 4, "graft_rotidx_app", 4)
    // the corruption guard: raw append against a rotated index must
    // refuse with a directing message, never encode
    val err = intercept[IllegalArgumentException] {
      Similarity.appendAnnIndex(b2, "graft_rotidx_app")
    }
    assert(err.getMessage.contains("appendAnnIndexRotated"))
    Similarity.appendAnnIndexRotated(b2, "graft_rotidx_app")
    // reference: one-shot writeAnnIndex over the WHOLE corpus rotated
    // by batch-1's trained chain (stored artifacts stay the original
    // build's — the FAISS add-after-train contract); codebooks match
    // because head ids live in batch 1
    val us = Similarity.trainedRotationUs(b1, 4, 4)
    Similarity.writeAnnIndex(
      Similarity.rotateEmbeddingsBy(emb, us), 16, 16, 4, "graft_rotidx_ref", 4)
    def codes(t: String) = spark.table(s"${t}_codes")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[scala.collection.Seq[Int]]("codes").mkString(",")))
      .sortBy(c => (c._1, c._2)).toSeq
    assert(codes("graft_rotidx_app") === codes("graft_rotidx_ref"))
  }

  test("deflated components are near-orthogonal and find the two planted axes") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    // variance planted on axes 2 (heavy) and 5 (lighter) of 8
    val e = (0L until 60L).map { i =>
      val v = Array.fill(8)(0.01f * rng.nextGaussian().toFloat)
      v(2) += 3.0f * rng.nextGaussian().toFloat
      v(5) += 1.5f * rng.nextGaussian().toFloat
      (i, v)
    }.toDF("vec_id", "embedding")
    val comps = Similarity.pcaComponents(e, 2, nIter = 12, dim = 8)
    val v1 = comps(0); val v2 = comps(1)
    assert(math.abs(v1(2)) > 0.9, s"pc1 should align with axis 2: ${v1.toSeq}")
    assert(math.abs(v2(5)) > 0.9, s"pc2 should align with axis 5: ${v2.toSeq}")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.05, s"components should be near-orthogonal, dot=$dot")
  }
}
