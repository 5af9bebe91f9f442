package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** TextOps contracts that HardeningSpec's uniform corpora don't
  * exercise — above all the tfidf skew contract: a stopword-dominated
  * corpus must produce identical results through the broadcast-df
  * map-side join and through the un-hinted join (the
  * `broadcastDf = false` path a web-scale vocabulary requires, where
  * AQE skew-splitting replaces the broadcast), and the broadcast path
  * must actually plan a broadcast.
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  /** 60 docs where "the" is > 50% of all tokens — the stopword-skew
    * shape that would hash every (doc, "the") row to one reducer if
    * the tf⋈df join shuffled on raw token.
    */
  private def skewedCorpus() = {
    import spark.implicits._
    (0 until 60).map { i =>
      val toks = Seq.fill(7)("the") ++
        Seq(s"mid${i % 3}", s"mid${i % 3}", "common", s"term$i", s"term$i")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Run `body` with broadcast joins disabled so the un-hinted path
    * really exercises the shuffle join, then restore the session.
    */
  private def withoutBroadcast[A](body: => A): A = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      prev.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevAqe.fold(conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }

  test("tfidf: broadcast-df and un-hinted shuffle join agree on a stopword-dominated corpus") {
    val docs = skewedCorpus()
    // stopword density precondition: "the" really dominates the corpus
    val toks = docs.collect().flatMap(_.getString(1).split(" "))
    assert(toks.count(_ == "the").toDouble / toks.length > 0.5)
    val hinted = TextOps.tfidf(docs, 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    val unhinted = withoutBroadcast {
      TextOps.tfidf(docs, 3, broadcastDf = false).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    }
    assert(hinted === unhinted)
    assert(hinted.size === 60 * 3)
  }

  test("tfidf ranks doc-unique rare terms above the everywhere-stopword") {
    val top1 = TextOps.tfidf(skewedCorpus(), 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // "the" appears in every doc → idf = ln(1) = 0 → never top-ranked;
    // the doc-unique rare term must win despite tf("the") = 7 > tf = 2
    (0 until 60).foreach(i => assert(top1(i.toLong) === s"term$i"))
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),     // benchmark member
      (1L, "zeta beta gamma delta eta theta"),    // shares "beta gamma delta" 3-gram
      (2L, "iota kappa lambda mu nu"),            // disjoint
      (3L, "alpha beta gamma delta zeta"),        // shares the same 3-gram AND "alpha beta gamma"
      (4L, "xi om")                               // shorter than n — zero grams, never flagged
    ).toDF("doc_id", "text")
    val bench = docs.where($"doc_id" === 0L)
    val out = TextOps.decontaminate(docs, bench, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(0L) === ((3L, 1)))  // all 3 of its own 3-grams
    assert(out(1L) === ((1L, 1)))  // "beta gamma delta"
    assert(out(2L) === ((0L, 0)))
    assert(out(3L) === ((2L, 1)))  // "alpha beta gamma" + "beta gamma delta"
    assert(out(4L) === ((0L, 0)))
  }

  test("decontaminateScore: overlap fraction separates boilerplate from full copies") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),     // benchmark member: 3/3 grams hit
      (1L, "zeta beta gamma delta eta theta"),    // 1 of 4 grams → frac 0.25
      (2L, "iota kappa lambda mu nu"),            // disjoint → 0.0
      (4L, "xi om")                               // gram-less → NULL frac
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminateScore(docs, docs.where($"doc_id" === 0L), 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(out(0L) === ((3L, 3L, Some(1.0))))
    assert(out(1L) === ((4L, 1L, Some(0.25))))
    assert(out(2L) === ((3L, 0L, Some(0.0))))
    assert(out(4L) === ((0L, 0L, None)))
  }

  test("decontaminate broadcasts the benchmark n-gram side") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, s"tok$i a b c d e f")).toDF("doc_id", "text")
    val df = TextOps.decontaminate(docs, docs.where($"doc_id" < 2), 3)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "benchmark gram set must ride as a broadcast")
  }

  test("repetition: degenerate and diverse docs get the right fractions") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x x x x"),          // 3 bigrams, 1 distinct → dup 2/3; top tok 4/4
      (1L, "a b c d"),          // all distinct → dup 0; top 1/4
      (2L, "a b a b a")         // bigrams: ab ba ab ba → 4 grams 2 distinct → dup 0.5; top 3/5
    ).toDF("doc_id", "text")
    val out = TextOps.repetition(docs, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0L) === ((3L, 0.667, 1.0)))
    assert(out(1L) === ((3L, 0.0, 0.25)))
    assert(out(2L) === ((4L, 0.5, 0.6)))
  }

  test("compositeFilter rejects for each reason independently") {
    import spark.implicits._
    val long = (1 to 95).map(i => s"w$i").mkString(" ")          // too long
    val good = (1 to 40).map(i => s"w$i").mkString(" ")
    // "the" interleaved among distinct words: all bigrams distinct
    // (dup 0) so the stopword cap is the ONLY reject reason
    val stopy = (1 to 30).flatMap(i =>
      if (i % 3 == 0) Seq("the", s"w$i") else Seq(s"w$i")).mkString(" ")  // stop 10/40 = 0.25
    val repy = (Seq.fill(20)("x x") ++ (1 to 20).map(i => s"w$i")).mkString(" ")   // heavy dup
    val docs = Seq((0L, good), (1L, long), (2L, stopy), (3L, repy), (4L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = TextOps.compositeFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out(0L) === 1)
    assert(out(1L) === 0)   // n_toks 95 > 90
    assert(out(2L) === 0)   // stop_ratio 0.25 > 0.15
    assert(out(3L) === 0)   // dup_frac >> 0.10
    assert(out(4L) === 0)   // 2 tokens < 30
  }

  test("packSequences: straddling docs and per-shard stream reset") {
    import spark.implicits._
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = Seq(
      (0L, words(300), "A"), (1L, words(300), "A"), (2L, words(100), "A"),
      (3L, words(600), "B")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.packSequences(docs, 512).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(0L) === ((0L, 0L, 0L)))
    assert(out(1L) === ((0L, 300L, 1L)))   // 300..599 straddles the 512 cut
    assert(out(2L) === ((1L, 88L, 1L)))    // stream pos 600
    assert(out(3L) === ((0L, 0L, 1L)))     // shard B's stream starts at 0
  }

  test("shuffled packing: deterministic non-id order, conserved stream") {
    import spark.implicits._
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = (0L until 20L).map(i => (i, words(100), "A")).toDF("doc_id", "text", "source")
    val a = TextOps.packSequencesShuffled(docs, 256).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val b = TextOps.packSequencesShuffled(docs, 256).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(a === b) // same seed → identical layout across runs
    val plain = TextOps.packSequences(docs, 256).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(a !== plain) // the order is genuinely shuffled vs doc_id order
    // stream conservation: the multiset of start offsets is the same
    // as id-order packing (uniform 100-token docs), only permuted
    assert(a.values.toSeq.sorted === plain.values.toSeq.sorted)
    // different seed → different layout
    val c = TextOps.packSequencesShuffled(docs, 256, seed = "other").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(a !== c)
  }

  test("corpus pipeline composes: filter, decontaminate, dedup, pack") {
    import spark.implicits._
    def words(pfx: String, k: Int) = (1 to k).map(i => s"$pfx$i").mkString(" ")
    val docs = Seq(
      (0L, words("z", 40), "A"),   // benchmark member → contaminated → out
      (1L, words("w", 40), "A"),   // survives; cluster min of {1, 2}
      (2L, words("w", 40), "A"),   // exact dup of 1 → clustered out
      (3L, "tiny doc", "A"),       // fails the token-count filter
      (4L, words("v", 40), "A")    // survives
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Corpus
      .pipeline(docs, docs.where($"doc_id" === 0L))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.keySet === Set(1L, 4L))
    assert(out(1L) === ((40L, 0L, 0L, 0L)))
    assert(out(4L) === ((40L, 0L, 40L, 0L)))  // stream resumes after doc 1
  }

  test("topTokensCms: wide sketch is exact; 1-bucket sketch collapses to total tokens") {
    import spark.implicits._
    // "a"×6, "b"×3, "c"×1 across docs
    val docs = Seq((1L, "a a a b"), (2L, "a a a b b c"))
      .toDF("doc_id", "text")
    // w=1024 ≫ 3 distinct tokens: collisions (per 60-bit md5 slice)
    // are absent, so every estimate equals the exact count
    val wide = TextOps.topTokensCms(docs, 3).orderBy("rank").collect()
    assert(wide.map(r => (r.getAs[String]("token"), r.getAs[Long]("n_exact"))).toSeq
      === Seq(("a", 6L), ("b", 3L), ("c", 1L)))
    wide.foreach { r =>
      assert(r.getAs[Long]("n_cms") === r.getAs[Long]("n_exact"))
      assert(r.getAs[Double]("over_err") === 0.0)
    }
    // w=2, d=1: pigeonhole forces collisions; the estimate stays
    // one-sided (>= exact) and total cell mass = total tokens (10)
    val tight = TextOps.topTokensCms(docs, 3, d = 1, w = 2).collect()
    tight.foreach(r => assert(r.getAs[Long]("n_cms") >= r.getAs[Long]("n_exact")))
    assert(tight.map(r => r.getAs[Long]("n_cms")).max <= 10L)
  }

  test("lmScore: exact unigram log-probs on a tiny corpus") {
    import spark.implicits._
    // counts: a=3, b=1, c=1, total=5 → P(a)=0.6, P(b)=P(c)=0.2
    val docs = Seq((0L, "a a a b"), (1L, "c")).toDF("doc_id", "text")
    val out = TextOps.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0L) === ((4L, -0.785)))  // (3·ln .6 + ln .2)/4
    assert(out(1L) === ((1L, -1.609)))  // ln .2
  }

  test("graft_ngram_stats matches the HOF formulation") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val docs = (skewedCorpus().collect().map(r => (r.getLong(0), r.getString(1))) ++
      Seq((100L, "x x x x"), (101L, "a b a b a"), (102L, "solo"), (103L, "p q")))
      .toSeq.toDF("doc_id", "text")
    val both = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        expr("graft_ngram_stats(toks, 2)").as("st"),
        expr("transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2)))").as("grams"),
        col("toks"))
      .select(col("doc_id"),
        col("st.ngrams").as("a1"), size(col("grams")).as("b1"),
        col("st.n_distinct").as("a2"), size(array_distinct(col("grams"))).as("b2"),
        col("st.top_run").as("a3"),
        expr("array_max(transform(array_distinct(toks), t -> size(filter(toks, x -> x = t))))").as("b3"))
      .collect()
    both.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"ngrams mismatch doc ${r.getLong(0)}")
      assert(r.getInt(3) === r.getInt(4), s"distinct mismatch doc ${r.getLong(0)}")
      assert(r.getInt(5) === r.getInt(6), s"top_run mismatch doc ${r.getLong(0)}")
    }
    assert(both.length > 60)
  }

  test("new ops tolerate degenerate inputs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "", "A"),        // split("") = [""] — 1 token
      (1L, "x", "A"),       // 1 token
      (2L, "a b", "A")      // minimal 2-token doc
    ).toDF("doc_id", "text", "source")
    // repetition & filter silently drop sub-n docs (contract: the
    // WHERE is part of the operator), keep the minimal one
    assert(TextOps.repetition(docs, 2).collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(TextOps.compositeFilter(docs).collect().map(r => (r.getLong(0), r.getInt(4))).toMap
      === Map(2L -> 0)) // 2 tokens < 30 → reject, not crash
    // empty benchmark: nothing can be contaminated
    val d = TextOps.decontaminate(docs, docs.where($"doc_id" < 0), 3).collect()
      .map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(d === Set((0L, 0)))
    // pack over 1-token docs: every doc placed, stream positions add up
    val p = TextOps.packSequences(docs, 512).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(p === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // fully-filtered corpus → empty pipeline output, no crash
    assert(graft.operators.Corpus.pipeline(docs, docs.where($"doc_id" < 0)).count() === 0L)
  }

  test("lmScore: broadcast-counts and un-hinted paths agree on a stopword-dominated corpus") {
    val docs = skewedCorpus()
    val hinted = TextOps.lmScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unhinted = withoutBroadcast {
      TextOps.lmScore(docs, broadcastCounts = false).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(hinted === unhinted)
    assert(hinted.size === 60)
  }

  test("lmScore reads the document bodies exactly once (checkpointed tf, no second scan)") {
    // The single-pass contract (VERDICT r7 #2): tf is materialized by
    // an eager localCheckpoint, vocab counts and the total are DERIVED
    // from it — so the returned plan must contain no parquet scan of
    // documents at all (only checkpoint-RDD scans).
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextOps.lmScore(docs)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("parquet"),
      s"lmScore plan re-scans the corpus:\n$plan")
  }

  test("graft_ngram_stats rejects null array elements with a named error") {
    graft.functions.VectorExprs.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_ngram_stats(array('a', CAST(NULL AS STRING), 'b'), 2)").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(err).exists(c =>
      Option(c.getMessage).exists(_.contains("graft_ngram_stats: null array element"))),
      s"expected the named null-element error, got: $err")
  }

  test("compositeFilter(retainAll) rejects reserved-name collisions eagerly") {
    import spark.implicits._
    val docs = Seq((0L, "a b c", 1)).toDF("doc_id", "text", "keep")
    val err = intercept[IllegalArgumentException] {
      TextOps.compositeFilter(docs, retainAll = true)
    }
    assert(err.getMessage.contains("keep"))
    // without retainAll the input column is simply not carried through
    assert(TextOps.compositeFilter(docs).columns.count(_ == "keep") === 1)
  }

  test("corpus pipeline filter thresholds are real knobs") {
    import spark.implicits._
    def words(pfx: String, k: Int) = (1 to k).map(i => s"$pfx$i").mkString(" ")
    val docs = Seq(
      (0L, words("z", 40), "A"),   // benchmark member → contaminated → out
      (1L, words("w", 40), "A"),   // survives; cluster min of {1, 2}
      (2L, words("w", 40), "A"),   // exact dup of 1 → clustered out
      (3L, "tiny doc", "A"),       // 2 tokens: dropped at minTokens=30, kept at 2
      (4L, words("v", 40), "A")
    ).toDF("doc_id", "text", "source")
    val bench = docs.where($"doc_id" === 0L)
    val loose = graft.operators.Corpus.pipeline(docs, bench, minTokens = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(loose.keySet === Set(1L, 3L, 4L))
    // placements re-pack around the now-surviving doc 3 (40 + 2 + 40
    // tokens in doc_id order within shard A)
    assert(loose(1L) === 0L && loose(3L) === 40L && loose(4L) === 42L)
    // and tightening maxTokens drops the 40-token docs entirely
    assert(graft.operators.Corpus.pipeline(docs, bench, maxTokens = 10).count() === 0L)
  }

  test("corpus pipeline lm band drops out-of-band docs before dedup") {
    import spark.implicits._
    def words(pfx: String, k: Int) = (1 to k).map(i => s"$pfx$i").mkString(" ")
    // unigram counts: w-tokens appear twice (docs 1+2), every other
    // token once → lmScore(doc 1) = ln(2/162) ≈ −4.394, all-unique
    // docs ≈ −5.088; the band keeps only the w-docs, of which the
    // cluster min (1) survives dedup
    val docs = Seq(
      (0L, words("z", 40), "A"),
      (1L, words("w", 40), "A"),
      (2L, words("w", 40), "A"),
      (3L, "tiny doc", "A"),
      (4L, words("v", 40), "A")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Corpus.pipeline(docs, docs.where($"doc_id" === 0L),
        lmScoreBand = Some((-4.5, -4.0)))
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L)) // doc 4 (in-filter, out-of-band) dropped by the lm stage
  }

  test("corpus pipeline mixture stage rebalances survivors before packing") {
    import spark.implicits._
    def words(pfx: String, k: Int) = (1 to k).map(i => s"$pfx$i").mkString(" ")
    // all five docs pass the default filter (40 tokens, unique text);
    // no benchmark overlap, no dup clusters — survivors = all of them
    val docs = Seq(
      (0L, words("a", 40), "A"), (1L, words("b", 40), "A"),
      (2L, words("c", 40), "A"),
      (3L, words("d", 40), "B"), (4L, words("e", 40), "B")
    ).toDF("doc_id", "text", "source")
    val bench = docs.where($"doc_id" < 0)
    // budgets: A = 40 tokens — only the stream-first doc starts under
    // it (position 40 is NOT < 40; the keep rule is on the exclusive
    // START position, as in sampleTokenBudget); B = 100 — positions 0
    // and 40 both start under it, so both docs survive
    val out = graft.operators.Corpus.pipeline(docs, bench,
        mixture = Some((Map("A" -> 0.2, "B" -> 0.5), 200L)))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.count(_._2 == "A") === 1, s"A over budget: ${out.toSeq}")
    assert(out.count(_._2 == "B") === 2)
    // an unweighted source drops entirely
    val onlyB = graft.operators.Corpus.pipeline(docs, bench,
        mixture = Some((Map("B" -> 1.0), 200L)))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(onlyB.map(_._2).toSet === Set("B"))
    // packing runs on the POST-mixture stream: B kept both docs, so
    // placements are contiguous from position 0 in doc_id order
    val b = graft.operators.Corpus.pipeline(docs, bench,
        mixture = Some((Map("B" -> 1.0), 200L)), budget = 64)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(b.toSeq === Seq((3L, 0L, 0L), (4L, 0L, 40L)))
  }

  test("lmScoreBigram: exact conditional log-probs; paths agree under disabled broadcasts") {
    import spark.implicits._
    // corpus bigrams: c(a,b)=2, c(b,a)=1, c(a,c)=1 → c(a,·)=3, c(b,·)=1
    // doc0 = a b a c: (ln(2/3) + ln(1/1) + ln(1/3)) / 3 → −0.501
    // doc1 = a b:      ln(2/3)                          → −0.405
    val docs = Seq((0L, "a b a c"), (1L, "a b"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextOps.lmScoreBigram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map(0L -> ((3L, -0.501)), 1L -> ((1L, -0.405)))) // sub-2-token doc dropped
    val skew = skewedCorpus()
    val hinted = TextOps.lmScoreBigram(skew).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unhinted = withoutBroadcast {
      TextOps.lmScoreBigram(skew, broadcastCounts = false).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(hinted === unhinted)
  }

  test("winnow: shared-substring guarantee, injectivity, short-doc edges") {
    import spark.implicits._
    // k=4, w=3 → any shared substring of length ≥ 6 must share a fp.
    // For k=4 the power sum (≤ 31³·255 ≈ 7.6e6) never reaches the
    // modulus, so the hash is INJECTIVE on 4-char ascii grams — set
    // intersections below are exact substring evidence, not collisions.
    val shared = "abcdefghij"
    val docs = Seq(
      (0L, s"xx$shared"), (1L, s"${shared}zzzz"), (2L, "qqqqqqqqqqqq")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    def s(id: Long) = fps.filter(_._1 == id).map(_._2).toSet
    assert((s(0) & s(1)).nonEmpty, "10-char shared substring must share a fingerprint")
    assert((s(0) & s(2)).isEmpty)
    assert(s(2).size === 1) // all-equal grams → one distinct fp
    val pairs = TextOps.winnowPairs(docs, 4, 3, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
    // shorter than k → no grams; exactly k → one window, one fp
    assert(TextOps.winnow(Seq((9L, "abc")).toDF("doc_id", "text"), 4, 3).count() === 0L)
    assert(TextOps.winnow(Seq((9L, "abcd")).toDF("doc_id", "text"), 4, 3).count() === 1L)
  }

  test("bm25: exact scores on a two-doc corpus; no-match docs dropped") {
    import spark.implicits._
    // N=2, df(x)=2, dl=2=avgdl → idf = ln(1.2);
    // d0 tf=1: ln(1.2)·2.2/(1+1.2) = ln(1.2)        → 0.182
    // d1 tf=2: ln(1.2)·2·2.2/(2+1.2) = 1.375·ln(1.2) → 0.251
    val docs = Seq((0L, "x a"), (1L, "x x")).toDF("doc_id", "text")
    val out = TextOps.bm25(docs, Seq("x"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 0.251, 1L), (0L, 0.182, 2L)))
    // a doc with no query term never appears
    val none = TextOps.bm25(Seq((0L, "a b"), (1L, "x y")).toDF("doc_id", "text"),
      Seq("z"), 10).collect()
    assert(none.isEmpty)
  }

  test("bm25 reads the document bodies exactly once (checkpointed base, no second scan)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextOps.bm25(docs, Seq("hash", "join"), 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("parquet"),
      s"bm25 plan re-scans the corpus:\n$plan")
  }

  test("sampleTokenBudget keeps a budgeted prefix of the shuffled stream, per shard") {
    import spark.implicits._
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = (0L until 10L).map(i => (i, words(100), if (i < 5) "A" else "B"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.sampleTokenBudget(docs, 250L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // per shard: positions 0, 100, 200 survive (< 250), 300+ dropped
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet === Set("A", "B"))
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === Seq(0L, 100L, 200L))
    }
    // deterministic: same seed → same doc set; different seed → different
    val again = TextOps.sampleTokenBudget(docs, 250L).collect().map(_.getLong(0)).toSet
    assert(again === out.map(_._1).toSet)
    val other = TextOps.sampleTokenBudget(docs, 250L, seed = "other")
      .collect().map(_.getLong(0)).toSet
    assert(other !== again)
    // a budget below every doc still keeps one doc per shard
    assert(TextOps.sampleTokenBudget(docs, 1L).count() === 2L)
  }

  test("sampleMixture fills per-source floor(w·N) budgets; unweighted sources drop") {
    import spark.implicits._
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = (0L until 15L).map(i => (i, words(100),
      if (i < 5) "A" else if (i < 10) "B" else "C"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.sampleMixture(docs,
        Map("A" -> 0.6, "B" -> 0.4), 500L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    // budgets: A = 300 (positions 0,100,200), B = 200 (0,100); C absent
    assert(out.map(_._2).toSet === Set("A", "B"))
    assert(out.count(_._2 == "A") === 3)
    assert(out.count(_._2 == "B") === 2)
    out.foreach { case (_, s, budget, pos) =>
      assert(budget === (if (s == "A") 300L else 200L))
      assert(pos < budget)
    }
    // single-source mixture ≡ sampleTokenBudget on the filtered corpus
    // at the same effective budget and seed — shared streamPos machinery
    val mix = TextOps.sampleMixture(docs, Map("A" -> 1.0), 300L,
        seed = "budget").collect().map(_.getLong(0)).toSet
    val tb = TextOps.sampleTokenBudget(docs.where($"source" === "A"), 300L)
      .collect().map(_.getLong(0)).toSet
    assert(mix === tb)
    // a budget below every doc still keeps one doc per weighted source
    assert(TextOps.sampleMixture(docs, Map("C" -> 0.001), 1000L).count() === 1L)
    // contract errors are named, not silent empties
    intercept[IllegalArgumentException] {
      TextOps.sampleMixture(docs, Map.empty, 500L)
    }
    intercept[IllegalArgumentException] {
      TextOps.sampleMixture(docs, Map("A" -> 0.0), 500L)
    }
    // a positive weight whose floor(w·N) budget is 0 must error, not
    // silently drop the source
    val zeroBudget = intercept[IllegalArgumentException] {
      TextOps.sampleMixture(docs, Map("A" -> 0.001), 500L)
    }
    assert(zeroBudget.getMessage.contains("zero token budget"))
  }

  test("corpusStats: counts, vocab and exact-dup rate") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val r = TextOps.corpusStats(docs).collect().head
    assert(r.getLong(0) === 4L)  // n_docs
    assert(r.getLong(1) === 3L)  // unique texts
    assert(r.getLong(2) === 9L)  // tokens: 3 + 3 + 2 + 1
    assert(r.getLong(3) === 6L)  // vocab a..f
    assert(r.getDouble(4) === 2.25)
    assert(r.getDouble(5) === 0.25)
  }

  test("entropy: uniform, degenerate and mixed docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a b b"),   // H = ln4 − 4·ln2/4 = ln2          → 0.693
      (1L, "a b c d"),   // all distinct → H = ln4            → 1.386
      (2L, "x x x")      // single token → H = 0
    ).toDF("doc_id", "text")
    val out = TextOps.entropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) === ((4L, 2L, 0.693)))
    assert(out(1L) === ((4L, 4L, 1.386)))
    assert(out(2L) === ((3L, 1L, 0.0)))
  }

  test("crossDup flags corpus docs near-dup of reference docs only") {
    import spark.implicits._
    def words(pfx: String, k: Int) = (1 to k).map(i => s"$pfx$i").mkString(" ")
    val corpus = Seq(
      (1L, words("w", 40)),   // exact dup of reference doc 0 → flagged
      (3L, words("v", 40)),   // unique → clean
      (5L, words("w", 40))    // another dup of reference doc 0 → flagged
    ).toDF("doc_id", "text")
    val reference = Seq(
      (0L, words("w", 40)),
      (2L, words("q", 40))
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.crossDup(corpus, reference, 16, 2, 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) === ((1L, 0L, 1)))
    assert(out(3L) === ((0L, -1L, 0)))
    assert(out(5L) === ((1L, 0L, 1)))
    // corpus docs never flag against EACH OTHER (1 and 5 are mutual
    // dups but both reference-flag only via doc 0)
    assert(out.keySet === Set(1L, 3L, 5L))
  }

  test("tfidf hint broadcasts the tok-keyed df join — and is the ONLY thing that does") {
    // Differential assertion under withoutBroadcast: with automatic
    // broadcasts disabled, the only broadcast that can reach the tf⋈df
    // join is the explicit hint, so the hinted and un-hinted plans must
    // differ exactly there. (A bare "plan contains a broadcast" check
    // is vacuous here: the scalar n_docs crossJoin plans a
    // BroadcastNestedLoopJoin in BOTH paths.)
    val tokJoin = """BroadcastHashJoin \[tok#\d+""".r
    def plansTokBroadcast(df: org.apache.spark.sql.DataFrame): Boolean = {
      df.collect() // finalize AQE
      tokJoin.findFirstIn(df.queryExecution.executedPlan.toString).isDefined
    }
    withoutBroadcast {
      assert(plansTokBroadcast(TextOps.tfidf(skewedCorpus(), 3)),
        "hinted path must plan a tok-keyed BroadcastHashJoin")
      assert(!plansTokBroadcast(TextOps.tfidf(skewedCorpus(), 3, broadcastDf = false)),
        "un-hinted path must not broadcast the df side when broadcasts are disabled")
    }
  }

  test("hybridRrf fuses the two rank lists exactly: 1/(60+r_text) + 1/(60+r_vec)") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val terms = Seq("hash", "join", "vector")
    val nCand = 20
    val tr = TextOps.bm25(docs, terms, nCand)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val vr = graft.operators.Similarity.cosineTopK(emb, 1, nCand)
      .collect().map(r => r.getLong(1) -> r.getInt(3).toLong).toMap
    def r3(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0
    val expected = (tr.keySet ++ vr.keySet).toSeq
      .map(id => (id, r3(tr.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vr.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))))
      .sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
      .map { case ((id, s), i) => (id, s, (i + 1).toLong) }.toSet
    val got = TextOps.hybridRrf(docs, emb, terms, nCand, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // a doc on BOTH lists must beat a doc whose single-list rank is no
    // better than either of its ranks — the point of fusion
    val both = (tr.keySet intersect vr.keySet)
    if (both.nonEmpty) {
      val b = both.minBy(id => tr(id) + vr(id))
      val bScore = 1.0 / (60 + tr(b)) + 1.0 / (60 + vr(b))
      val singles = (tr.keySet diff vr.keySet).filter(id => tr(id) >= math.max(tr(b), vr(b)))
      singles.foreach(s => assert(bScore > 1.0 / (60 + tr(s))))
    }
  }

  test("maskPii counts and masks every class; masked text has zero residual PII") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at alice.b+test@corp.example.org or +44 123-4567 ok"),
      (2L, "server 10.0.255.3 and backup 8.8.8.8 hold the logs"),
      (3L, "no pii here at all"),
      (4L, "two mails a@b.co c@d.org one ip 1.2.3.4")
    ).toDF("doc_id", "text")
    val out = TextOps.maskPii(docs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((1L, 1L, 0L), (0L, 0L, 2L), (0L, 0L, 0L), (2L, 0L, 1L)))
    assert(out(0).getString(4) === "reach me at [EMAIL] or [PHONE] ok")
    assert(out(1).getString(4) === "server [IP] and backup [IP] hold the logs")
    assert(out(2).getString(4) === "no pii here at all")
    assert(out(3).getString(4) === "two mails [EMAIL] [EMAIL] one ip [IP]")
    // masking is a fixpoint: re-scanning masked text finds nothing
    val remasked = TextOps.maskPii(
      TextOps.maskPii(docs).select(col("doc_id"), col("masked").as("text")))
    assert(remasked.agg(sum(col("n_emails") + col("n_phones") + col("n_ips")))
      .collect().head.getLong(0) === 0L)
    // the injected-PII corpus carries exactly one of each per doc
    val inj = TextOps.maskPii(TextOps.withInjectedPii(
      Seq((7L, "plain words only")).toDF("doc_id", "text"))).collect().head
    assert((inj.getLong(1), inj.getLong(2), inj.getLong(3)) === ((1L, 1L, 1L)))
  }

  test("dupSpanRatio: shared k-gram spans counted across docs, not within") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e x y z w q"),     // shares "a b c d e" with doc 2
      (2L, "a b c d e p q r s t"),
      (3L, "m n o p q r s t u v"),     // shares "p q r s t" with doc 2
      (4L, "k k k k k k k k"))         // self-repetition only: no dup
      .toDF("doc_id", "text")
    val out = TextOps.dupSpanRatio(docs, 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 6 spans, exactly 1 ("a b c d e") duplicated
    assert(out(1L) === ((6L, 1L, 0.167)))
    // doc 4: distinct spans collapse to one ("k k k k k"), unique corpus-wide
    assert(out(4L) === ((1L, 0L, 0.0)))
    // doc 2 shares its head with doc 1 and tail with doc 3
    assert(out(2L)._2 === 2L)
    assert(out(3L)._2 === 1L)
  }

  test("bpeTrain recovers hand-computed merges (greedy ties, early stop); bpeEncode replays them") {
    import spark.implicits._
    // corpus "aaab"×2 + "aab"×1: pair counts round 1 are (a,a)=5
    // (two per aaab, one per aab), (a,b)=3 → merge aa. Round 2 state
    // aaab=[aa,a,b], aab=[aa,b]: (aa,a)=2, (a,b)=2, (aa,b)=1 — the
    // count tie breaks lexicographically on lhs ("a" < "aa") → merge
    // ab. Round 3: aaab=[aa,ab] → (aa,ab)=2 beats (aa,b)=1. Round 4:
    // only (aa,b)=1 remains. Round 5: every word is one symbol →
    // trainer must stop early at 4 merges.
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val merges = TextOps.bpeTrainMerges(docs, 10)
    assert(merges === Seq((1, "a", "a", 5L), (2, "a", "b", 2L),
      (3, "aa", "ab", 2L), (4, "aa", "b", 1L)))
    // greedy left-to-right is non-overlapping: aaaa + (a,a) → [aa, aa]
    val run = TextOps.bpeEncode(Seq((1L, "aaaa")).toDF("doc_id", "text"),
      Seq(("a", "a"))).collect().head
    assert(run.getAs[Long]("n_tokens") === 2L)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(run.getAs[String]("fp") === md5hex("aa aa"))
    // replaying the learned merges tokenizes training AND unseen words:
    // aaabab → aa,a,b,a,b → aa,ab,ab → aaab,ab → [aaab, ab]; the
    // single-char word "c" is untouched and its own token
    val enc = TextOps.bpeEncode(
      Seq((1L, "aaab aab"), (2L, "aaabab c")).toDF("doc_id", "text"),
      merges.map(m => (m._2, m._3)))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("fp")))).toMap
    assert(enc(1L) === ((2L, md5hex("aaab aab"))))
    assert(enc(2L) === ((3L, md5hex("aaab ab c"))))
  }

  test("bpeTokenFreq counts what the tokenizer emits, weighted by word frequency") {
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    // after merges (a,a),(a,b): aaab -> [aa, ab], aab -> [aa, b]
    val f2 = TextOps.bpeTokenFreq(docs, 2, 10).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n")).toMap
    assert(f2 === Map("aa" -> 3L, "ab" -> 2L, "b" -> 1L))
    // the full 4-merge vocabulary absorbs both words whole
    val f4 = TextOps.bpeTokenFreq(docs, 4, 10).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("token"), r.getAs[Long]("n")))
    assert(f4.toSeq.sorted === Seq((1L, "aaab", 2L), (2L, "aab", 1L)))
  }

  test("sampleTemperature: T=1 reproduces natural proportions; higher T up-weights the tail") {
    import spark.implicits._
    // token masses 60/30/10 across three sources (10 tokens per doc)
    val tok10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 6).map(i => (i.toLong, tok10, "big")) ++
      (6 until 9).map(i => (i.toLong, tok10, "mid")) ++
      Seq((9L, tok10, "small")))
      .toDF("doc_id", "text", "source")
    def budgets(t: Double) = TextOps.sampleTemperature(docs, t, 1000L)
      .select("shard", "budget").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t1 = budgets(1.0)
    assert(t1 === Map("big" -> 600L, "mid" -> 300L, "small" -> 100L))
    val t2 = budgets(2.0)
    // sqrt weights: .473/.334/.193 of 1000
    assert(t2 === Map("big" -> 473L, "mid" -> 334L, "small" -> 193L))
    assert(t2("small") > t1("small") && t2("big") < t1("big"))
  }

  test("boilerplate flags cross-document frequent n-grams, not unique prose") {
    import spark.implicits._
    // "sign up for updates" (grams: 2×3-gram) is chrome shared by docs
    // 0-3 (df=4 ≥ minDf=3); each doc's tail is unique prose. Doc 4 is
    // all-unique; doc 5 is too short for a 3-gram and must be DROPPED
    // (not emitted as 0/0), matching the oracle's len >= n filter.
    val docs = Seq(
      (0L, "sign up for updates alpha beta gamma"),
      (1L, "sign up for updates delta epsilon zeta"),
      (2L, "sign up for updates eta theta iota"),
      (3L, "sign up for updates kappa lambda mu"),
      (4L, "nu xi omicron pi rho sigma tau"),
      (5L, "up for")).toDF("doc_id", "text")
    val out = TextOps.boilerplate(docs, 3, 3).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // 7 tokens → 5 gram positions; hits = "sign up for" + "up for updates"
    out.take(4).foreach { r =>
      assert(r.getAs[Long]("ngrams") === 5L)
      assert(r.getAs[Long]("bp_hits") === 2L)
      assert(r.getAs[Double]("bp_ratio") === 0.4)
    }
    assert(out(4).getAs[Long]("bp_hits") === 0L)
    assert(out(4).getAs[Double]("bp_ratio") === 0.0)
    // a gram REPEATED inside one doc counts once toward df (distinct
    // docs) but every position toward the hit ratio
    val rep = Seq(
      (0L, "x y z x y z a"),   // "x y z" twice in doc 0
      (1L, "x y z b c d e"),
      (2L, "x y z f g h i")).toDF("doc_id", "text")
    val r0 = TextOps.boilerplate(rep, 3, 3).orderBy("doc_id").collect().head
    assert(r0.getAs[Long]("bp_hits") === 2L)   // positions 1 and 4
  }
}
