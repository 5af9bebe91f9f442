package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Filtered search + the stored index's delete/compact lifecycle:
  * metadata predicates rank only matching candidates (pre-filter
  * semantics), tombstones hide ids from every probe path immediately,
  * and compaction folds them in without changing any answer.
  */
class AnnLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  val dir = "/root/testdata/sf0.001"

  private def dropIndex(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${table}_codes")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_meta")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_tombstones")
  }

  private def r3c(c: org.apache.spark.sql.Column) = floor(c * 1000.0 + 0.5001) / 1000.0

  private def probeRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("qid"), col("vid"), col("adist"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet

  test("filtered brute search: only label-matching candidates, exact per-query top-k") {
    val emb = Tables.embeddings(spark, dir)
    val k = 3
    val got = Similarity.cosineTopKFiltered(emb, 5, k, 10)
      .select(col("qid"), col("vid"), col("label"), col("cos"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4)))
    assert(got.nonEmpty)
    assert(got.forall { case (qid, _, label, _, _) => label == (qid % 10).toInt })
    // exact recompute in plain Scala: same left-to-right dot, same r3
    // rounding, same (cos desc, vid) tiebreak over the filtered set
    def r3(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0
    val vecs = emb.where(col("embedding").isNotNull)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Number](2).map(_.doubleValue()).toArray))
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val expected = (for {
      (qid, _, qv) <- vecs.filter(_._1 < 5)
      qn = math.sqrt(dot(qv, qv))
      (vid, label, cand, cos) <- vecs
        .filter { case (vid, label, _) => vid != qid && label == (qid % 10).toInt }
        .map { case (vid, label, v) =>
          (vid, label, v, r3(dot(v, qv) / (math.sqrt(dot(v, v)) * qn))) }
        .sortBy { case (vid, _, _, cos) => (-cos, vid) }
        .take(k).zipWithIndex
        .map { case ((vid, label, v, cos), i) => (vid, label, v, (cos, i + 1)) }
    } yield (qid, vid, label, cos._1, cos._2)).toSet
    assert(got.toSet === expected)
  }

  test("stored filtered probe: predicate holds and equals recompute-then-rank over the filtered set") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_lc_flt", 4)
      val q = emb.where(col("vec_id") < 5)
      val got = probeRows(Similarity.annIvfPqAgainstIndexFiltered(
        q, "graft_lc_flt", 5, 10))
      assert(got.nonEmpty)
      // every hit matches its query's predicate
      val labels = emb.select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got.forall { case (qid, vid, _, _) => labels(vid) == (qid % 10).toInt })
      // expected = the unfiltered scored pairs, filtered by label, then
      // ranked (adist asc, vid) per qid — pre-filter semantics exactly
      val scored = Similarity.annIndexScored(q, "graft_lc_flt")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val expected = scored
        .filter { case (qid, vid, _) => labels(vid) == (qid % 10).toInt }
        .groupBy(_._1).toSeq.flatMap { case (qid, g) =>
          g.sortBy { case (_, vid, d) => (d, vid) }.take(5).zipWithIndex
            .map { case ((_, vid, d), i) => (qid, vid, d, i + 1) }
        }.toSet
      assert(got === expected)
    } finally dropIndex("graft_lc_flt")
  }

  test("tombstoned ids vanish from every probe path immediately") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_lc_del", 4)
      val q = emb.where(col("vec_id") < 5)
      val before = probeRows(Similarity.annIvfPqAgainstIndex(q, "graft_lc_del", 5))
      val victim = before.map(_._2).max
      import spark.implicits._
      Similarity.deleteFromAnnIndex(Seq(victim).toDF("vec_id"), "graft_lc_del")
      val after = probeRows(Similarity.annIvfPqAgainstIndex(q, "graft_lc_del", 5))
      assert(!after.exists(_._2 == victim))
      assert(before.exists(_._2 == victim))
      // SQ probe and SQ reconstruction honor the same tombstones
      val sqVids = Similarity.annIvfSqAgainstIndex(q, "graft_lc_del", 5)
        .select(col("vid")).collect().map(_.getLong(0)).toSet
      assert(!sqVids.contains(victim))
      val reconIds = Similarity.annIndexRecon(spark, "graft_lc_del")
        .select(col("vec_b")).collect().map(_.getLong(0)).toSet
      assert(!reconIds.contains(victim))
    } finally dropIndex("graft_lc_del")
  }

  test("compaction: codes shrink, tombstones drop, probe answers unchanged") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_lc_cmp", 4)
      val total = spark.table("graft_lc_cmp_codes").count()
      // compaction with nothing to fold is a no-op
      Similarity.compactAnnIndex("graft_lc_cmp")
      assert(spark.table("graft_lc_cmp_codes").count() === total)
      val deletes = emb.where(col("vec_id") >= 16 && col("vec_id") % 5 === 3)
        .select(col("vec_id"))
      val nDel = deletes.count()
      assert(nDel > 0)
      Similarity.deleteFromAnnIndex(deletes, "graft_lc_cmp")
      val q = emb.where(col("vec_id") < 5)
      val masked = probeRows(Similarity.annIvfPqAgainstIndex(q, "graft_lc_cmp", 5))
      Similarity.compactAnnIndex("graft_lc_cmp")
      assert(!spark.catalog.tableExists("graft_lc_cmp_tombstones"))
      assert(spark.table("graft_lc_cmp_codes").count() === total - nDel)
      val compacted = probeRows(Similarity.annIvfPqAgainstIndex(q, "graft_lc_cmp", 5))
      assert(compacted === masked)
      assert(compacted.nonEmpty)
    } finally dropIndex("graft_lc_cmp")
  }

  test("range search returns exactly the same-cell recon-cosine hits and honors tombstones") {
    val emb = Tables.embeddings(spark, dir)
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_lc_rng", 4)
      val q = emb.where(col("vec_id") < 5)
      val got = Similarity.annRangeAgainstIndex(q, "graft_lc_rng", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.nonEmpty)
      assert(got.forall(_._3 >= 0.3))
      // exhaustiveness: joining recon to queries by cell and filtering
      // in the test reproduces the full hit set (nothing pruned away
      // beyond the cell and the threshold)
      graft.functions.VectorExprs.register(spark)
      val encIvf = Similarity.annIndexQuantizer(spark, "graft_lc_rng")
      val qc = q.select(col("vec_id").as("qid"), col("embedding").as("qv"),
        expr(s"coalesce(graft_ivf_cell(embedding, '$encIvf'), -1L)").as("cell"))
      val expected = Similarity.annIndexRecon(spark, "graft_lc_rng")
        .join(qc, Seq("cell")).where(col("vec_b") =!= col("qid"))
        .select(col("qid"), col("vec_b"),
          r3c(expr("graft_vec_dot(qv, rv)") /
            (sqrt(expr("graft_vec_dot(qv, qv)")) * sqrt(expr("graft_vec_dot(rv, rv)"))))
            .as("cos"))
        .where(col("cos") >= 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected)
      // tombstoning a hit removes it from the range result
      val victim = got.head._2
      import spark.implicits._
      Similarity.deleteFromAnnIndex(Seq(victim).toDF("vec_id"), "graft_lc_rng")
      val after = Similarity.annRangeAgainstIndex(q, "graft_lc_rng", 0.3)
        .collect().map(_.getLong(1)).toSet
      assert(!after.contains(victim))
    } finally dropIndex("graft_lc_rng")
  }

  test("plan census: filtered probe keeps ONE Exchange, range search has ZERO, delete adds none") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val emb = Tables.embeddings(spark, dir)
    val conf = spark.conf
    val prevAqe = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Similarity.writeAnnIndex(emb, 16, 16, 4, "graft_lc_plan", 4)
      val q = emb.where(col("vec_id") < 5)
      def shuffles(df: org.apache.spark.sql.DataFrame) = {
        df.collect()
        df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
      }
      // label pre-filter is scan-side: the probe still shuffles ONLY
      // the per-(qid, vid) partial sums
      assert(shuffles(Similarity.annIndexScored(q, "graft_lc_plan",
        labelMod = Some(10))) === 1)
      // range search is scan → broadcast joins → filter: NO shuffle at
      // all — the cheapest possible nightly sweep shape
      assert(shuffles(Similarity.annRangeAgainstIndex(q, "graft_lc_plan", 0.3)) === 0)
      // the tombstone mask is a broadcast anti-join: still no extra
      // shuffle on either path
      import spark.implicits._
      Similarity.deleteFromAnnIndex(Seq(999999L).toDF("vec_id"), "graft_lc_plan")
      assert(shuffles(Similarity.annIndexScored(q, "graft_lc_plan",
        labelMod = Some(10))) === 1)
      assert(shuffles(Similarity.annRangeAgainstIndex(q, "graft_lc_plan", 0.3)) === 0)
    } finally {
      prevAqe.fold(conf.unset("spark.sql.adaptive.enabled"))(
        conf.set("spark.sql.adaptive.enabled", _))
      dropIndex("graft_lc_plan")
    }
  }

  test("deleting from a missing index is a named error") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      Similarity.deleteFromAnnIndex(Seq(1L).toDF("vec_id"), "graft_no_such_idx"))
    assert(e.getMessage.contains("writeAnnIndex"))
  }
}
