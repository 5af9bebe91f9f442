package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The stored IVFPQ index: write once / probe with stored codebooks /
  * append deltas — the encode-once boundary of the ANN stack.
  */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  val dir = "/root/testdata/sf0.001"

  private def dropIndex(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${table}_codes")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_meta")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getInt(3))).toSet

  test("stored probe is byte-equal to the recompute path") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_annidx_t", 4)
      val stored = rows(Similarity.annIvfPqAgainstIndex(
        emb.where(col("vec_id") < 5), "graft_annidx_t", 5))
      val fresh = rows(Similarity.annIvfPqTopK(emb, 16, 16, 4, 5, 5))
      assert(stored === fresh)
      assert(stored.nonEmpty)
    } finally dropIndex("graft_annidx_t")
  }

  test("rotated stored probe equals the recompute path; rotation read from the index") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndexRotated(emb, 16, 16, 4, "graft_annidxr_t", 4)
      val stored = rows(Similarity.annIvfPqRotatedAgainstIndex(
        emb.where(col("vec_id") < 5), "graft_annidxr_t", 5))
      // recompute path: untrained IVFPQ over the trained-rotation
      // corpus (the writeAnnIndex head-vector codebook convention)
      val us = Similarity.trainedRotationUs(emb, 4, 4)
      val fresh = rows(Similarity.annIvfPqTopK(
        Similarity.rotateEmbeddingsBy(emb, us), 16, 16, 4, 5, 5))
      assert(stored === fresh)
      assert(stored.nonEmpty)
      // the rotation travels WITH the index
      assert(spark.catalog.tableExists("graft_annidxr_t_rot"))
    } finally {
      dropIndex("graft_annidxr_t")
      spark.sql("DROP TABLE IF EXISTS graft_annidxr_t_rot")
    }
  }

  test("rotated probe without the rotation meta is a named error") {
    val emb = Tables.embeddings(spark, dir)
    try {
      // plain index, no _rot table: probing it rotated must fail
      // loudly, never silently search the unrotated space
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_annidx_nr", 4)
      val e = intercept[IllegalArgumentException](
        Similarity.annIvfPqRotatedAgainstIndex(
          emb.where(col("vec_id") < 5), "graft_annidx_nr", 5))
      assert(e.getMessage.contains("rotation meta"))
    } finally dropIndex("graft_annidx_nr")
  }

  test("probing a missing index is a named error, not a wrong answer") {
    val emb = Tables.embeddings(spark, dir)
    val e = intercept[IllegalArgumentException](
      Similarity.annIvfPqAgainstIndex(emb.where(col("vec_id") < 5),
        "graft_no_such_idx", 5).collect())
    assert(e.getMessage.contains("writeAnnIndex"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.appendAnnIndex(emb.where(col("vec_id") < 5), "graft_no_such_idx"))
    assert(e2.getMessage.contains("writeAnnIndex"))
  }

  test("two-batch build (train head, then append delta) equals one-shot") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_annidx_t1", 4)
      // first batch carries the codebook head (the train step); the
      // append encodes only its delta with the STORED codebooks
      Similarity.writeAnnIndex(
        emb.where(col("vec_id") < 16 || col("vec_id") % 2 === 0),
        16, 16, 4, "graft_annidx_t2", 4)
      Similarity.appendAnnIndex(
        emb.where(col("vec_id") >= 16 && col("vec_id") % 2 === 1), "graft_annidx_t2")
      // the stored index CONTENTS must match row-for-row, not just the
      // probe output: same (vec_id, cell, codes) set either way
      def contents(t: String) = spark.table(t)
        .select(col("vec_id"), col("cell"), col("codes").cast("string"),
          col("sq").cast("string"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      val one = contents("graft_annidx_t1_codes")
      val two = contents("graft_annidx_t2_codes")
      assert(one === two)
      val p1 = rows(Similarity.annIvfPqAgainstIndex(
        emb.where(col("vec_id") < 5), "graft_annidx_t1", 5))
      val p2 = rows(Similarity.annIvfPqAgainstIndex(
        emb.where(col("vec_id") < 5), "graft_annidx_t2", 5))
      assert(p1 === p2)
    } finally { dropIndex("graft_annidx_t1"); dropIndex("graft_annidx_t2") }
  }

  test("probe plan: zero Exchange between the stored scan and the pair agg") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val emb = Tables.embeddings(spark, dir)
    val conf = spark.conf
    val prevAqe = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false") // static plan → inspectable
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_annidx_p", 4)
      val scored = Similarity.annIndexScored(
        emb.where(col("vec_id") < 5), "graft_annidx_p")
      scored.collect()
      val plan = scored.queryExecution.executedPlan
      // raw vectors are never read: the ONLY file scan is the stored
      // codes table (the query side is a LocalTableScan-free broadcast
      // built from the embeddings read, which IS allowed — so assert
      // the codes scan exists and carries no Exchange below the agg)
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size === 1,
        s"probe must shuffle ONLY the per-(qid,vid) partial sums:\n$plan")
      // the single Exchange sits ABOVE the stored scan subtree: the
      // scan → explode → joins → partial-agg pipeline is exchange-free
      val below = exchanges.head.child.collect {
        case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "graft_annidx_p_codes") => f
      }
      assert(below.nonEmpty,
        s"the stored codes scan must feed the agg without any Exchange:\n$plan")
    } finally {
      prevAqe.fold(conf.unset("spark.sql.adaptive.enabled"))(
        conf.set("spark.sql.adaptive.enabled", _))
      dropIndex("graft_annidx_p")
    }
  }

  test("rerank lifts recall over plain ADC and never exceeds 1.0") {
    val e = Tables.embeddings(spark, dir)
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recall"))).head.getDouble(0)
    val plain = mean(Similarity.annIvfPqRecall(e, 16, 16, 4, 5, 5))
    val rerank = mean(Similarity.annIvfPqRerankRecall(e, 16, 16, 4, 5, 25, 5))
    assert(rerank >= plain,
      s"exact re-scoring of a 5x shortlist must not LOSE recall: $rerank < $plain")
    assert(rerank <= 1.0 + 1e-9)
  }

  test("rerank output is ordered by exact cosine within each query") {
    val out = Similarity.annIvfPqRerank(
      Tables.embeddings(spark, dir), 16, 16, 4, 5, 25, 5).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      val cs = byRank.map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"cosine must be non-increasing in rank: ${cs.mkString(",")}")
    }
  }
}
