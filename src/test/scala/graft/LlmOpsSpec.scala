package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextOps}

class LlmOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup flags copies, keeps smallest id") {
    val d = docs((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "something else here"))
    val out = Dedup.exact(d).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_copies")).toSeq === Seq(2L, 2L, 1L))
    assert(out.map(_.getAs[Int]("keep")).toSeq === Seq(1, 0, 1))
  }

  test("jaccard of identical docs is 1, disjoint docs absent") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
    val pairs = docs((1L, ""), (2L, ""), (3L, "")).select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
    val j = Dedup.jaccard(Dedup.shingles(d), pairs).collect()
    assert(j.length === 1) // only (1,2) share shingles
    assert(j.head.getAs[Double]("jaccard") === 1.0)
  }

  test("minhash-LSH candidates include identical docs") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "p q r s t u v w"))
    val cand = Dedup.lshCandidates(Dedup.minhash(Dedup.shingles(d), 16), 2).collect()
    assert(cand.exists(r => r.getLong(0) === 1L && r.getLong(1) === 2L))
    assert(cand.find(r => r.getLong(0) === 1L && r.getLong(1) === 2L).get.getAs[Long]("shared_bands") === 8L)
  }

  test("lshTuningCurve: S-curve endpoints, monotonicity, and the b=r=4 threshold") {
    val out = Dedup.lshTuningCurve(spark, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    // 5 divisor splits × 19 grid points
    assert(out.size === 5 * 19)
    // b=16,r=1: p = 1-(1-s)^16 — high recall even at s=0.2
    assert(out((16L, 1L, 0.2))._1 > 0.9)
    // b=1,r=16: p = s^16 — nothing below s=0.8
    assert(out((1L, 16L, 0.5))._1 === 0.0)  // 0.5^16 rounds to 0
    // b=r=4: threshold (1/4)^(1/4) = 0.707, and p is ~tiny below, high above
    assert(out((4L, 4L, 0.5))._2 === 0.707)
    assert(out((4L, 4L, 0.3))._1 < 0.05 && out((4L, 4L, 0.9))._1 > 0.9)
    // monotone in s for a fixed split
    val curve = (1 to 19).map(i => out((4L, 4L, i / 20.0))._1)
    assert(curve === curve.sorted)
  }

  test("one-pass minhash sigs and band candidates match the explode formulation") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val fast = Dedup.lshCandidatesFast(Dedup.minhashSigs(d, 16), 2, 16)
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = Dedup.lshCandidates(Dedup.minhash(Dedup.shingles(d), 16), 2)
      .orderBy("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fast.toSeq === slow.toSeq)
    assert(fast.nonEmpty)
  }

  test("simhashFast matches the explode simhash") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val fast = Dedup.simhashFast(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(fast === slow)
  }

  test("connected components label each dup cluster by its smallest doc id") {
    import spark.implicits._
    // components {1,2,3} (chain) and {7,8}; 9 isolated (absent from pairs)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("connected components converge on a long chain (pointer jumping)") {
    import spark.implicits._
    // a 40-node path: plain min-propagation needs ~40 rounds (> maxIter
    // default), pointer jumping needs ~log2(40)
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 40)
    assert(cc.values.toSet === Set(0L))
  }

  test("minhash signature is NULL for shingle-less input, not all-MAX") {
    graft.functions.VectorExprs.register(spark)
    import spark.implicits._
    val out = Seq((1L, Array.empty[String]), (2L, Array("a b c")))
      .toDF("doc_id", "shingles")
      .selectExpr("doc_id", "graft_minhash(shingles, 4) AS sig")
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(1), "empty shingle set must yield NULL signature")
    assert(out(1).getSeq[Long](1).length === 4)
  }

  test("lsh bucket fails fast above MAX_DIM instead of truncating") {
    graft.functions.VectorExprs.register(spark)
    val wide = spark.range(1).selectExpr(
      s"graft_lsh_bucket(array_repeat(CAST(1.0 AS DOUBLE), ${graft.functions.LshBucket.MAX_DIM + 1}), 4) AS b")
    val e = intercept[Exception] { wide.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("MAX_DIM")))
  }

  test("dedup pipeline keeps one doc per near-dup cluster, all singletons") {
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),   // dup cluster
      (3L, "p q r s t u v w"),                            // singleton
      (7L, "x y z x y z x y"), (9L, "x y z x y z x y"))   // dup cluster
    val out = Dedup.pipeline(d, 16, 2, 0.5).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 1L, 1), (2L, 1L, 0), (3L, 3L, 1), (7L, 7L, 1), (9L, 7L, 0)))
  }

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val d = docs((1L, "Hello,  WORLD!  42"))
    val out = TextOps.normalize(d).collect().head
    assert(out.getString(1) === "hello world 42")
    assert(out.getLong(2) === 3L)
  }

  test("jaccard estimate is 1 for identical docs, rough for near-dups") {
    val d = docs((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
    val sigs = Dedup.minhashSigs(d, 16)
    val pairs = Dedup.lshCandidatesFast(sigs, 2, 16)
    val est = Dedup.jaccardEstimate(sigs, pairs, 16).collect()
    assert(est.length === 1)
    assert(est.head.getAs[Double]("jaccard_est") === 1.0)
  }

  test("ann IVF finds the identical vector through its cell") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // same cell as query 0
      (11L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val ann = Similarity.annIvfTopK(e, 2, 1, 3).collect()
    assert(ann.exists(r => r.getAs[Long]("vid") === 10L && r.getAs[Double]("cos") === 1.0))
    // vec 11 lives in centroid 1's cell, not the query's
    assert(!ann.exists(r => r.getAs[Long]("vid") === 11L))
  }

  test("kmeans: one Lloyd round moves each centroid to its cell's rounded mean") {
    import spark.implicits._
    // two tight groups on orthogonal axes; seeds 0 and 1 are one member
    // of each group, so after one round each centroid is the group mean
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.8f, 0.2f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(e, 2, 1).toMap
    def r3(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0
    // cell 0 = {0, 2}: mean (0.9, 0.1, 0, 0); cell 1 = {1, 3}
    assert(cents(0L).toSeq === Seq(r3((1.0 + 0.8f.toDouble) / 2), r3(0.2f.toDouble / 2), 0.0, 0.0))
    assert(cents(1L).toSeq === Seq(0.0, r3((1.0 + 0.9f.toDouble) / 2), r3(0.1f.toDouble / 2), 0.0))
    // nIter = 0 is exactly the seed (the first-N convention)
    val seed = Similarity.kmeansCentroids(e, 2, 0).toMap
    assert(seed(0L).toSeq === Seq(1.0, 0.0, 0.0, 0.0))
  }

  test("kmeans_fit sizes cover the corpus; trained IVF search stays cell-pruned") {
    import spark.implicits._
    val e = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(d => (((i * 7 + d * 3) % 11).toFloat + 1f) / 11f)))
      .toDF("vec_id", "embedding")
    val fit = Similarity.kmeansFit(e, 3, 2).collect()
    assert(fit.map(_.getAs[Long]("n")).sum === 40L)
    assert(fit.map(_.getAs[Long]("cid")).toSet.subsetOf(Set(0L, 1L, 2L)))
    // the composition returns ranked same-cell neighbours per query
    val ann = Similarity.annIvfTopKTrained(e, 3, 2, 2, 3)
    val rows = ann.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rank") <= 3))
    // and never pairs a query with itself
    assert(rows.forall(r => r.getAs[Long]("qid") !== r.getAs[Long]("vid")))
  }

  test("pq training: one per-subspace Lloyd round moves codewords to rounded sub-means") {
    import spark.implicits._
    // dim 4, m 2: subspace codewords seeded from vecs 0/1; vecs 2/3
    // sit near one codeword per subspace, so the round's means are known
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (2L, Array(0.8f, 0.2f, 0.0f, 0.9f)),
      (3L, Array(0.2f, 0.9f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val (cids, books) = Similarity.pqTrainedBooks(e, 2, 2, 1)
    def r3(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0
    assert(cids(0).toSeq === Seq(0L, 1L) && cids(1).toSeq === Seq(0L, 1L))
    // subspace 0: c0 <- {v0,v2} sub0, c1 <- {v1,v3} sub0
    assert(books(0)(0).toSeq === Seq(r3((1.0 + 0.8f.toDouble) / 2), r3(0.2f.toDouble / 2)))
    assert(books(0)(1).toSeq === Seq(r3(0.2f.toDouble / 2), r3((1.0 + 0.9f.toDouble) / 2)))
    // subspace 1: c0 <- {v0,v2} sub1, c1 <- {v1,v3} sub1
    assert(books(1)(0).toSeq === Seq(0.0, r3((1.0 + 0.9f.toDouble) / 2)))
    assert(books(1)(1).toSeq === Seq(r3((1.0 + 0.9f.toDouble) / 2), r3(0.1f.toDouble / 2)))
    // fit gate: every vector accounted for in every subspace
    val fit = Similarity.pqFit(e, 2, 2, 1).collect()
    assert(fit.map(_.getAs[Long]("n")).sum === 8L) // 4 vecs x 2 subspaces
    // trained search returns ranked rows and never self-pairs
    val ann = Similarity.annPqTopKTrained(e, 2, 2, 1, 1, 3).collect()
    assert(ann.nonEmpty && ann.forall(r => r.getAs[Long]("qid") !== r.getAs[Long]("vid")))
  }

  test("ann PQ: codebook vectors encode to their own codes; identical vector ranks first") {
    import spark.implicits._
    // dim 4, m = 2 subspaces of 2; codebook = vecs 0 and 1
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // identical to query 0 → adist 0, rank 1
      (11L, Array(0.0f, 1.0f, 1.0f, 0.0f)))  // codebook-1-shaped → farther from q0
      .toDF("vec_id", "embedding")
    graft.functions.VectorExprs.register(spark)
    // direct code check: each codebook vector is its own nearest codeword
    val cids = Array.fill(2)(Array(0L, 1L))
    val books = Array.tabulate(2)(s => Array(
      Array(1.0, 0.0, 0.0, 0.0).slice(s * 2, s * 2 + 2),
      Array(0.0, 1.0, 1.0, 0.0).slice(s * 2, s * 2 + 2)))
    val enc = graft.functions.PqCodes.encode(cids, books)
    val codes = e.selectExpr("vec_id", s"graft_pq_codes(embedding, '$enc') AS c")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(0L) === Seq(0L, 0L) && codes(10L) === Seq(0L, 0L))
    assert(codes(1L) === Seq(1L, 1L) && codes(11L) === Seq(1L, 1L))
    val ann = Similarity.annPqTopK(e, 2, 2, 1, 3).orderBy("rank").collect()
    assert(ann.head.getAs[Long]("vid") === 10L)
    assert(ann.head.getAs[Double]("adist") === 0.0)
    // same-code vectors share an adist; farther codes rank below
    assert(ann.last.getAs[Double]("adist") >= ann.head.getAs[Double]("adist"))
  }

  test("ann IVFPQ prunes to the query's cell and scores by code distance") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // query 0's cell, identical → rank 1, adist 0
      (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // query 0's cell, near
      (12L, Array(0.0f, 1.0f, 0.9f, 0.0f)))  // centroid 1's cell → pruned away
      .toDF("vec_id", "embedding")
    val ann = Similarity.annIvfPqTopK(e, 2, 2, 2, 1, 5).orderBy("rank").collect()
    assert(ann.head.getAs[Long]("vid") === 10L)
    assert(ann.head.getAs[Double]("adist") === 0.0)
    assert(!ann.exists(_.getAs[Long]("vid") == 12L), "other-cell vector must be pruned")
    assert(ann.exists(_.getAs[Long]("vid") == 11L), "same-cell near vector must be scored")
  }

  test("graft_pq_codes rejects a malformed codebook eagerly") {
    val err = intercept[IllegalArgumentException] {
      graft.functions.PqCodes.encode(Array(Array(1L, 0L)),
        Array(Array(Array(1.0), Array(0.0))))
    }
    assert(err.getMessage.contains("sorted ascending"))
  }

  test("simhash: identical docs equal, different docs differ") {
    val d = docs((1L, "a b c d"), (2L, "a b c d"), (3L, "totally different words here now"))
    val s = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(s(1L) === s(2L))
    assert(s(1L) !== s(3L))
  }

  test("fingerprint is order-sensitive") {
    val d = docs((1L, "ab"), (2L, "ba"))
    val f = TextOps.fingerprint(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f(1L) !== f(2L))
    assert(f(1L) === (97L * 31 + 98) % 1000000007)
  }

  test("native rolling-hash fingerprint matches the HOF formulation") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = TextOps.fingerprint(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = TextOps.fingerprintHof(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === hof)
    assert(native.nonEmpty)
  }

  test("token count and quality ratios are sane") {
    val d = docs((1L, "the cat and the hat 42"))
    val t = TextOps.tokenCount(d).collect().head
    assert(t.getAs[Long]("ws_tokens") === 6L)
    val q = TextOps.quality(d).collect().head
    assert(q.getAs[Double]("stop_ratio") > 0.3) // 'the' x2 + 'and' of 6
    assert(q.getAs[Double]("digit_ratio") > 0.0)
    assert(q.getAs[Double]("score") > 0.0 && q.getAs[Double]("score") <= 1.0)
  }

  test("ann cosineTopK ranks an identical vector first") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f)),   // identical direction to query 0
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(0.9f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(e, 1, 2, dim = 3).orderBy("rank").collect()
    assert(top.head.getAs[Long]("vid") === 10L)
    assert(top.head.getAs[Double]("cos") === 1.0)
  }

  test("native SimHash64 expression matches the explode formulation") {
    graft.functions.SimHash64.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.selectExpr("doc_id", "graft_simhash(split(text, ' ')) AS simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exploded = graft.operators.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(native === exploded)
  }

  test("lsh buckets put identical vectors together; annLsh finds them") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (10L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (11L, Array(-1.0f, -2.0f, 1.0f, -0.5f)))
      .toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(e, 8, dim = 4).collect().map(r => r.getLong(0) -> r.getAs[Long]("bucket")).toMap
    assert(b(0L) === b(10L))
    assert(b(0L) !== b(11L)) // opposite vector flips every plane
    val ann = Similarity.annLshTopK(e, 8, 1, 3, dim = 4).collect()
    assert(ann.exists(r => r.getAs[Long]("vid") === 10L && r.getAs[Double]("cos") === 1.0))
  }

  test("packTokenStream stitches document tokens across sequence boundaries in order") {
    import spark.implicits._
    // shard s: doc 1 = "a b c", doc 2 = "d e f g" — budget 5 packs the
    // stream a b c d e | f g (doc 2 straddles the boundary)
    val docs = Seq((1L, "s", "a b c"), (2L, "s", "d e f g"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.packTokenStream(docs, 5).orderBy("seq").collect()
    assert(out.length === 2)
    def md5Hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getString(3)) ===
      ((0L, 5L, md5Hex("a b c d e"))))
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getString(3)) ===
      ((1L, 2L, md5Hex("f g"))))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged per source") {
    import spark.implicits._
    val old = Seq(
      (1L, "alpha", "s0"), (2L, "beta", "s0"),
      (3L, "gamma", "s1"), (4L, "delta", "s1"))
      .toDF("doc_id", "text", "source")
    val nu = Seq(
      (1L, "alpha", "s0"),          // unchanged
      (2L, "beta EDITED", "s0"),    // changed
      (4L, "delta", "s1"),          // unchanged (3 removed)
      (5L, "epsilon", "s1"))        // added
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Corpus.snapshotDiff(old, nu)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("s0", "unchanged") -> 1L, ("s0", "changed") -> 1L,
      ("s1", "removed") -> 1L, ("s1", "unchanged") -> 1L,
      ("s1", "added") -> 1L))
  }

  test("embedding covariance matches the hand-computed matrix; one scan, upper triangle") {
    import spark.implicits._
    // vectors (1,2), (3,4), (5,0): means (3, 2)
    // cov(0,0) = (1+9+25)/3 − 9 = 8/3 ≈ 2.667
    // cov(0,1) = (2+12+0)/3 − 6 = −4/3 ≈ −1.333
    // cov(1,1) = (4+16+0)/3 − 4 = 8/3 ≈ 2.667
    val e = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)), (3L, Array(5.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.covariance(e, dim = 2).orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 0L, 2.667), (0L, 1L, -1.333), (1L, 1L, 2.667)))
  }

  test("pageRank: the hub of a star outranks its leaves; a symmetric pair ties") {
    import spark.implicits._
    // star: 0-1, 0-2, 0-3; separate pair: 8-9
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val pr = Dedup.pageRank(pairs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    assert(pr(0L) > pr(1L), s"hub must outrank leaves: $pr")
    assert(pr(1L) === pr(2L) && pr(2L) === pr(3L))
    assert(pr(8L) === pr(9L))
    // probability mass ≈ 1 across the graph (rounding eats a little)
    assert(math.abs(pr.values.sum - 1.0) < 0.01)
  }

  test("lmScoreKneserNey: hand-computed interpolated probabilities; mass normalizes") {
    // bigrams: (a,b) x2, (a,c) x1 -> c(a)=3, N1+(a,.)=2, N1+(.,b)=1,
    // N1+(.,c)=1, types=2. D=0.5:
    // P(b|a) = 1.5/3 + (0.5*2/3)*(1/2) = 2/3; P(c|a) = 0.5/3 + 1/6 = 1/3
    // (they sum to 1 - KN's discounted mass is exactly redistributed)
    // doc1 score = ln(2/3) = -0.405; doc3 score = ln(1/3) = -1.099
    val d = docs((1L, "a b"), (2L, "a b"), (3L, "a c"))
    val out = TextOps.lmScoreKneserNey(d, discount = 0.5).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("kn_score")).toMap
    assert(out(1L) === -0.405)
    assert(out(2L) === -0.405)
    assert(out(3L) === -1.099)
  }

  test("containment: quoted-whole fragment scores 1.0 from the small side") {
    import spark.implicits._
    // doc 1's shingles {abc, bcd} all live inside doc 2 ({abc, bcd, cde})
    val d = Seq((1L, "a b c d"), (2L, "a b c d e")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containment(Dedup.shingles(d), pairs).collect().head
    assert(r.getAs[Long]("inter") === 2L)
    assert(r.getAs[Double]("containment_a") === 1.0)
    assert(r.getAs[Double]("containment_b") === 0.667)
  }

  test("knnGraph: neighbours stay inside the cluster, ranked by cosine") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    // two antipodal clusters, ids alternating so the first-2 quantizer
    // seeds one centroid in each
    val e = (0L until 12L).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      val v = Array.fill(8)(0.02f * rng.nextGaussian().toFloat)
      v(0) += sign * 2.0f
      (i, v)
    }.toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(e, 2, 3).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      // same-parity neighbours only (cells = the two clusters)
      assert(r.getLong(0) % 2 === r.getLong(1) % 2, s"cross-cluster edge: $r")
      assert(r.getAs[Double]("cos") > 0.9)
    }
    // every vector gets exactly k = 3 edges (cells have 6 members)
    g.groupBy(_.getLong(0)).values.foreach(rows => assert(rows.length === 3))
    assert(g.length === 36)
  }

  test("keepBest keeps the highest-quality member per cluster, min-id on ties") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("doc_id", "score")
    val keep = Dedup.keepBest(labels, scores).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(keep === Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1))
  }

  test("labelProp splits bridged triangles that connectedComponents merges") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the single bridge
    // 3-4: one connected component, two dense communities. Hand-traced
    // synchronous rounds (mode of neighbours, ties -> smallest label):
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4
    // r2: 1→1 2→1 3→1 4→4 5→3 6→3
    // r3: 1→1 2→1 3→1 4→3 5→3 6→3
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    val lp = Dedup.labelProp(pairs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lp.toSet === Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 3L, 3L), (5L, 3L, 3L), (6L, 3L, 3L)))
    // CC on the same graph: one component, everything labelled 1
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(1)).toSet
    assert(cc === Set(1L))
  }

  test("bpePairCounts: corpus-weighted adjacent pairs, single-char words ignored") {
    // "abab" ×2 docs + "ab x bc": pairs of abab = ab, ba, ab → per occurrence;
    // word frequencies: abab:2, ab:1, bc:1; x dropped (length 1)
    // ab: 2·2 (from abab) + 1 = 5; ba: 2·1 = 2; bc: 1
    val d = docs((1L, "abab ab"), (2L, "abab x bc"))
    val out = TextOps.bpePairCounts(d, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("ab" -> 5L, "ba" -> 2L, "bc" -> 1L))
  }

  test("whitenEmbeddings: hand-computed standardization; flat dims center only") {
    import spark.implicits._
    // dim 0: values 1, 3 → μ=2, σ=1; dim 1: constant 7 → σ guard (:=1)
    val e = Seq((1L, Array(1.0f, 7.0f)), (2L, Array(3.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val w = Similarity.whitenEmbeddings(e, dim = 2).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1))
    assert(w(0) === Seq(-1.0, 0.0))
    assert(w(1) === Seq(1.0, 0.0))
    // and the audited contract on the whitened corpus
    val audit = Similarity.whitenAudit(e, dim = 2).orderBy("d").collect()
    assert(audit(0).getAs[Double]("mean") === 0.0)
    assert(audit(0).getAs[Double]("variance") === 1.0)
    assert(audit(1).getAs[Double]("variance") === 0.0)
  }

  test("chunkDocs: window starts, overlap, short tail, and content fingerprints") {
    val d = docs((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
    val out = TextOps.chunkDocs(d, 4, 3).orderBy("chunk_id").collect()
    // starts 0, 3, 6, 9 → windows of 4, 4, 4, and a 1-token tail
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq === Seq(4L, 4L, 4L, 1L))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getAs[String]("fp") === md5hex("t3 t4 t5 t6"))
    assert(out(3).getAs[String]("fp") === md5hex("t9"))
  }

  test("mmrRerank demotes the near-duplicate candidate below the diverse one") {
    import spark.implicits._
    // query 0 = e1; candidates 1 and 2 are the SAME direction (exact
    // duplicates, sim 1.0), candidate 3 is equally relevant (cos 0.8
    // to the query) but nearly orthogonal to them (sim 0.28). Plain
    // top-k tie-breaks by vid → (1, 2, 3); MMR's redundancy penalty
    // (3·1000 for the duplicate vs 3·280 for the diverse one at equal
    // relevance) must reorder to (1, 3, 2).
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f)),
      (2L, Array(0.8f, 0.6f, 0.0f)),
      (3L, Array(0.8f, -0.6f, 0.0f)))
      .toDF("vec_id", "embedding")
    val plain = Similarity.cosineTopK(e, 1, 3).orderBy("rank").collect()
      .map(_.getAs[Long]("vid")).toSeq
    assert(plain === Seq(1L, 2L, 3L))
    val mmr = Similarity.mmrRerank(e, 1, 3, 3).orderBy("mmr_rank").collect()
    assert(mmr.map(_.getAs[Long]("vid")).toSeq === Seq(1L, 3L, 2L))
    // rank-1 score is pure relevance (λ·rel); later scores are penalized
    assert(mmr.head.getAs[Double]("score") > mmr(2).getAs[Double]("score"))
    // a query with fewer candidates than k stops when exhausted — the
    // corpus only yields 3 candidates, so k=5 emits ranks 1..3 and NO
    // null-vid rows pad to k
    val short = Similarity.mmrRerank(e, 1, 5, 5).orderBy("mmr_rank").collect()
    assert(short.length === 3)
    assert(short.forall(r => !r.isNullAt(r.fieldIndex("vid"))))
    assert(short.map(_.getAs[Long]("vid")).toSeq === Seq(1L, 3L, 2L))
  }

  test("pcaPower recovers the dominant variance axis; projections track the coordinate") {
    import spark.implicits._
    // variance lives along dim 1 with a small correlated dim-0
    // component → pc ≈ (0.1, 1)/‖·‖; projections grow linearly in i
    val e = (0 until 10).map(i => (i.toLong,
      Array(0.1f * i, i.toFloat, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.pcaPower(e, nIter = 5, nOut = 10, dim = 4)
      .orderBy("vec_id").collect().map(_.getAs[Double]("pc1"))
    assert(out.sliding(2).forall(p => p(1) > p(0)), s"not monotone: ${out.toSeq}")
    // expected slope ≈ ‖(0.1, 1)‖ ≈ 1.005 per step
    val slope = (out(9) - out(0)) / 9.0
    assert(math.abs(slope - 1.005) < 0.01, s"slope $slope")
  }

  test("triangles: hand graph — clique corner, bridge, pendant, isolated edge") {
    import spark.implicits._
    // triangle {1,2,3}, pendant 4 on node 1, isolated edge {5,6}
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.triangles(pairs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("degree") === 3 && out(1L).getAs[Long]("triangles") === 1)
    assert(out(1L).getAs[Double]("clustering") === 0.333)
    assert(out(2L).getAs[Long]("triangles") === 1 && out(2L).getAs[Double]("clustering") === 1.0)
    assert(out(3L).getAs[Double]("clustering") === 1.0)
    assert(out(4L).getAs[Long]("triangles") === 0 && out(4L).isNullAt(out(4L).fieldIndex("clustering")))
    assert(out(5L).getAs[Long]("triangles") === 0 && out(6L).getAs[Long]("degree") === 1)
  }

  test("sampleImportance: acceptance is the exact md5-vs-score trial, reproducible") {
    import spark.implicits._
    val docs = (1L to 200L).map(i =>
      (i, ("word " * (i % 7 + 1).toInt).trim + " the of and", "s" + (i % 3)))
      .toDF("doc_id", "text", "source")
    val kept = TextOps.sampleImportance(docs).collect()
    // recompute each kept row's trial in plain scala
    val md = java.security.MessageDigest.getInstance("MD5")
    kept.foreach { r =>
      val hex = md.digest(s"importance:${r.getLong(0)}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val t = math.min(math.floor(r.getAs[Double]("score") * 4294967296.0), 4294967295.0).toLong
      assert(hex == r.getAs[String]("draw"))
      assert(hex < f"$t%08x", s"doc ${r.getLong(0)}: draw $hex must beat ${f"$t%08x"}")
    }
    // determinism: a second run returns the identical kept set
    val again = TextOps.sampleImportance(docs).collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_.getLong(0)).toSet)
  }

  test("packSequencesBpe: lengths are the bpeEncode counts; placements contiguous per shard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaab aaab", "s0"), (2L, "ab", "s0"), (3L, "aaab xyz aaab", "s0"),
      (4L, "zz zz zz", "s1"))
      .toDF("doc_id", "text", "source")
    val merges = TextOps.bpeTrainMerges(docs, 3).map(t => (t._2, t._3))
    val enc = TextOps.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val placed = TextOps.packSequencesBpe(docs, 5, merges)
      .orderBy("doc_id").collect()
    placed.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === enc(r.getLong(0)),
        s"doc ${r.getLong(0)}: packed length must be the tokenizer count")
    }
    // within each shard, stream positions tile with no gap or overlap
    placed.groupBy(_.getAs[String]("shard")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(0))
      val pos = ordered.scanLeft(0L)(_ + _.getAs[Long]("n_tokens"))
      ordered.zip(pos).foreach { case (r, p) =>
        assert(r.getAs[Long]("start_seq") === p / 5 &&
          r.getAs[Long]("start_offset") === p % 5)
      }
    }
  }

  test("sampleTokenBudgetBpe: n_tokens are the tokenizer counts, budget cut honors the md5 order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaab aaab", "s0"), (2L, "ab", "s0"), (3L, "aaab xyz aaab", "s0"),
      (4L, "zz zz zz", "s1"))
      .toDF("doc_id", "text", "source")
    val merges = TextOps.bpeTrainMerges(docs, 3).map(t => (t._2, t._3))
    val enc = TextOps.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a budget big enough for everything: every doc survives and each
    // n_tokens is the tokenizer count, positions are the exclusive
    // running sums in md5 order
    val all = TextOps.sampleTokenBudgetBpe(docs, 3, 1000L).collect()
    assert(all.length === 4)
    all.foreach(r => assert(r.getAs[Long]("n_tokens") === enc(r.getLong(0))))
    // budget 1: only the md5-first doc of each shard survives (the
    // first-doc guarantee), with stream_pos 0
    val cut = TextOps.sampleTokenBudgetBpe(docs, 3, 1L).collect()
    assert(cut.length === 2 && cut.forall(_.getAs[Long]("stream_pos") === 0L))
  }

  test("tokenTrending: a new-snapshot-only token tops the rising list; shared tokens score 0") {
    import spark.implicits._
    // even doc = old snapshot, odd = new; 3 tokens per side
    val docs = Seq((0L, "old old shared"), (1L, "new new shared"))
      .toDF("doc_id", "text")
    val out = TextOps.tokenTrending(docs, 3).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[String]("token"), r.getAs[Double]("score")))).toMap
    // score(new) = ln((3/4)/(1/4)) = ln 3 = r3 1.099, mirrored for old
    assert(out(1L) === (("new", 1.099)))
    assert(out(2L) === (("shared", 0.0)))
    assert(out(3L) === (("old", -1.099)))
  }

  test("embeddingDrift: a shifted dimension stands out, an identical one is 0") {
    import spark.implicits._
    // evens at 0, odds at 1 in dim 0; dim 1 identical everywhere
    val emb = (0L until 20L).map(i => (i, Seq((i % 2).toDouble, 5.0)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.embeddingDrift(emb).collect()
      .map(r => r.getAs[Long]("d") -> r).toMap
    assert(out(0L).getAs[Double]("mean_a") === 0.0)
    assert(out(0L).getAs[Double]("mean_b") === 1.0)
    assert(out(0L).getAs[Double]("drift") > 1000.0) // variance-free shift
    assert(out(1L).getAs[Double]("drift") === 0.0)
  }
}
