package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Eval, Relational}

/** Semantics of the evaluation / feature-engineering / CDC operators
  * on hand-computed frames.
  */
class EvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  test("fairness: per-group AUC matches hand computation; a single-class group gets NULL, never a sentinel") {
    import spark.implicits._
    // group g1: pos at 0.9, 0.7; neg at 0.8, 0.2 — Mann-Whitney pairs:
    //   (0.9 vs 0.8, 0.2) = 2 wins; (0.7 vs 0.8) loss, (0.7 vs 0.2)
    //   win → AUC = 3/4 = 0.75
    // group g2: all positive → AUC undefined (NULL); pos_rate = 1
    // group g3: one pos, one neg TIED at 0.5 → half credit, AUC 0.5
    val scored = Seq(
      ("g1", 0.9, true), ("g1", 0.7, true), ("g1", 0.8, false), ("g1", 0.2, false),
      ("g2", 0.4, true), ("g2", 0.6, true),
      ("g3", 0.5, true), ("g3", 0.5, false))
      .toDF("grp", "score", "label")
    val out = Eval.fairness(scored).collect()
      .map(r => r.getAs[String]("grp") -> (
        r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
        r.getAs[Double]("pos_rate"),
        Option(r.getAs[java.lang.Double]("auc_grp")))).toMap
    assert(out("g1") === ((4L, 2L, 0.5, Some(0.75))))
    assert(out("g2") === ((2L, 2L, 1.0, None)))
    assert(out("g3") === ((2L, 1L, 0.5, Some(0.5))))
  }

  test("fairnessOdds: per-group TPR/FPR at the threshold; missing classes get NULL") {
    import spark.implicits._
    // g1 at t = 0.5: pos scores (0.9 hit, 0.3 miss) → TPR 0.5;
    //               neg scores (0.6 hit, 0.2, 0.1) → FPR 1/3
    // g2: all positive → FPR undefined (NULL), TPR = 1 (both ≥ t)
    val scored = Seq(
      ("g1", 0.9, true), ("g1", 0.3, true),
      ("g1", 0.6, false), ("g1", 0.2, false), ("g1", 0.1, false),
      ("g2", 0.7, true), ("g2", 0.5, true))
      .toDF("grp", "score", "label")
    val out = Eval.fairnessOdds(scored, 0.5).collect()
      .map(r => r.getAs[String]("grp") -> (
        r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        Option(r.getAs[java.lang.Double]("tpr")),
        Option(r.getAs[java.lang.Double]("fpr")))).toMap
    assert(out("g1") === ((2L, 3L, Some(0.5), Some(0.333))))
    assert(out("g2") === ((2L, 0L, Some(1.0), None)))
  }

  test("attributionLastTouch: window honored, no-prior and stale both go direct") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val ev = Seq(
      (1L, 1L, ts(0), "view", 0.0),
      (1L, 2L, ts(1), "purchase", 10.0),   // -> view (1h ago)
      (1L, 3L, ts(2), "click", 0.0),
      (1L, 4L, ts(50), "purchase", 20.0),  // click was 48h ago -> direct
      (2L, 5L, ts(0), "purchase", 5.0))    // no prior -> direct
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.attributionLastTouch(ev, 86400000000L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map("view" -> ((1L, 10.0)), "direct" -> ((2L, 25.0))))
  }

  test("attributionLinear: equal split, repeat-channel double credit, stale and no-touch go direct") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val ev = Seq(
      (1L, 1L, ts(0), "view", 0.0),
      (1L, 2L, ts(1), "click", 0.0),
      (1L, 3L, ts(2), "purchase", 10.0),  // view+click -> 5 each
      (1L, 4L, ts(50), "purchase", 20.0), // all touches stale -> direct
      (2L, 5L, ts(0), "purchase", 5.0),   // no prior -> direct
      (3L, 6L, ts(0), "view", 0.0),
      (3L, 7L, ts(1), "view", 0.0),
      (3L, 8L, ts(2), "purchase", 9.0))   // view twice -> 4.5 + 4.5
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.attributionLinear(ev, 86400000000L).collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("n_credits"),
        r.getAs[Double]("revenue"))).sortBy(_._1)
    assert(out.toSeq === Seq(
      ("click", 1L, 5.0), ("direct", 2L, 25.0), ("view", 3L, 14.0)))
  }

  test("ohlcBars: endpoints by (ts, event_id), ties to the lower id; extremes exact") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Long) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      (1L, 10L, ts(5), "view", 7.0),   // first by time -> open 7
      (1L, 11L, ts(20), "view", 2.0),  // low
      (1L, 12L, ts(30), "view", 9.0),  // high
      (1L, 14L, ts(40), "view", 4.0),  // ts tie with 13: higher id
      (1L, 13L, ts(40), "view", 5.0))  // same ts, LOWER id -> close 4
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.ohlcBars(ev).collect().map(r =>
      (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"),
        r.getAs[Long]("n_events"), r.getAs[Double]("mean_value")))
    // close = the LAST by (ts, event_id) = id 14 (4.0): the tie goes
    // to the higher id at the max end
    assert(out.toSeq === Seq((7.0, 9.0, 2.0, 4.0, 5L, 5.4)))
  }

  test("cohortLtv: revenue cells, running cumulative, non-purchasers still count in cohort size") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00") // a Monday
    def ts(d: Long) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    val ev = Seq(
      (1L, 1L, ts(0), "purchase", 10.0), // cohort W0, week 0
      (1L, 2L, ts(7), "purchase", 4.0),  // week 1
      (2L, 3L, ts(1), "view", 0.0),      // cohort W0, never buys
      (3L, 4L, ts(8), "purchase", 6.0))  // cohort W1, week 0
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.cohortLtv(ev).collect().map(r =>
      (r.getAs[java.sql.Date]("cohort").toString, r.getAs[Long]("week_n"),
        r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue"),
        r.getAs[Long]("cohort_users"), r.getAs[Double]("ltv_per_user")))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 10.0, 10.0, 2L, 5.0),
      ("2024-01-01", 1L, 4.0, 14.0, 2L, 7.0),
      ("2024-01-08", 0L, 6.0, 6.0, 1L, 6.0)))
  }

  test("growthRates: calendar-honest lags, gaps yield NULL") {
    import spark.implicits._
    val rows = Seq(1, 2, 3, 4, 5, 6, 7, 8, 10).map(d =>
      (1L, java.sql.Date.valueOf(s"2024-01-${"%02d".format(d)}"), d * 10.0))
    val out = graft.operators.TimeSeries.growthRates(
        rows.toDF("user_id", "day", "v"))
      .orderBy("day").collect()
    // day2: dod = 20/10 - 1 = 1.0; day8: dod = 80/70-1 = 0.143,
    // wow = 80/10 - 1 = 7.0; day10: lag1 is day8 (gap) -> both NULL
    assert(out(1).getAs[Double]("dod") === 1.0)
    assert(out(7).getAs[Double]("dod") === 0.143)
    assert(out(7).getAs[Double]("wow") === 7.0)
    assert(out(8).isNullAt(out(8).fieldIndex("dod")))
    assert(out(8).isNullAt(out(8).fieldIndex("wow")))
  }

  test("dwellStats: lead gaps per type, last event excluded, exact quantiles") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // user 1: a@0 b@10 a@40 (a dwells: 10, -; b dwell: 30; last excluded)
    // user 2: a@0 a@20 (dwell 20)
    val ev = Seq(
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(10), "b"), (1L, 3L, ts(40), "a"),
      (2L, 4L, ts(0), "a"), (2L, 5L, ts(20), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Relational.dwellStats(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("mean_s"),
        r.getAs[Double]("p50_s"))).toMap
    // a: dwells {10, 20} → n=2, mean 15, p50 15; b: {30} → n=1
    assert(out("a") === ((2L, 15.0, 15.0)))
    assert(out("b") === ((1L, 30.0, 30.0)))
  }

  test("ndcg: perfect order scores 1, reversal pays position, misses pay more") {
    import spark.implicits._
    val exact = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("qid", "vid", "rank")
    // perfect: approx = exact order → DCG ≡ IDCG
    val perfect = Eval.ndcg(exact, exact, 3).collect().head
    assert(perfect.getAs[Long]("n_rel") === 3L)
    assert(perfect.getAs[Double]("ndcg") === 1.0)
    // full reversal: same hits, worst positions →
    // (1/ln2 + 2/ln3 + 3/ln4) / (3/ln2 + 2/ln3 + 1/ln4) = 0.790
    val rev = Seq((0L, 12L, 1L), (0L, 11L, 2L), (0L, 10L, 3L))
      .toDF("qid", "vid", "rank")
    assert(Eval.ndcg(exact, rev, 3).collect().head.getAs[Double]("ndcg") === 0.79)
    // recall can't tell these apart (both 3/3) — NDCG is the point
    val none = Seq((0L, 20L, 1L), (0L, 21L, 2L), (0L, 22L, 3L))
      .toDF("qid", "vid", "rank")
    val miss = Eval.ndcg(exact, none, 3).collect().head
    assert(miss.getAs[Long]("n_rel") === 0L)
    assert(miss.getAs[Double]("ndcg") === 0.0)
  }

  test("mrr: first relevant position, honest NULL on a full miss") {
    import spark.implicits._
    val exact = Seq((0L, 10L, 1L), (0L, 11L, 2L), (1L, 20L, 1L))
      .toDF("qid", "vid", "rank")
    // q0: first hit at approx rank 2 → rr 0.5; q1: no hits → NULL/0
    val approx = Seq((0L, 99L, 1L), (0L, 11L, 2L), (0L, 10L, 3L),
        (1L, 98L, 1L), (1L, 97L, 2L))
      .toDF("qid", "vid", "rank")
    val out = Eval.mrr(exact, approx).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), r.getDouble(2)))).toMap
    assert(out(0L) === ((Some(2L), 0.5)))
    assert(out(1L) === ((None, 0.0)))
    // perfect ranking: rr = 1 at rank 1
    val p = Eval.mrr(exact, exact).where(col("qid") === 0).collect().head
    assert(p.getLong(1) === 1L && p.getDouble(2) === 1.0)
  }

  test("rankCorr: agreement 1, reversal -1, partial hand value, disjoint NULL tau") {
    import spark.implicits._
    def ranking(qid: Long, vids: Seq[Long]) =
      vids.zipWithIndex.map { case (v, i) => (qid, v, (i + 1).toLong) }
    val a = (ranking(1L, Seq(10, 11, 12, 13)) ++ ranking(2L, Seq(10, 11, 12, 13)) ++
      ranking(3L, Seq(10, 11, 12, 13)) ++ ranking(4L, Seq(10, 11, 12, 13)))
      .toDF("qid", "vid", "rank")
    val b = (ranking(1L, Seq(10, 11, 12, 13)) ++ // identical -> tau 1
      ranking(2L, Seq(13, 12, 11, 10)) ++        // reversed -> tau -1
      ranking(3L, Seq(11, 10, 12, 13)) ++        // one adjacent swap
      ranking(4L, Seq(20, 21, 22, 23)))          // disjoint
      .toDF("qid", "vid", "rank")
    val out = Eval.rankCorr(a, b).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_common"),
        Option(r.getAs[java.lang.Double]("tau")).map(_.doubleValue()),
        r.getAs[Double]("jaccard"))).sortBy(_._1)
    assert(out(0) === ((1L, 4L, Some(1.0), 1.0)))
    assert(out(1) === ((2L, 4L, Some(-1.0), 1.0)))
    // one adjacent swap among 4 items: 5 concordant, 1 discordant of 6
    // pairs -> tau = 4/6 = 0.667 (r3)
    assert(out(2) === ((3L, 4L, Some(0.667), 1.0)))
    assert(out(3) === ((4L, 0L, None, 0.0)))
  }

  test("auc is exact and tie-aware on a hand-computed frame") {
    import spark.implicits._
    // scores: pos {0.9, 0.7, 0.5}, neg {0.7, 0.3}
    // pairs: (0.9 beats both)=2, (0.7: beats 0.3, ties 0.7)=1.5,
    //        (0.5: beats 0.3)=1  → AUC = 4.5 / 6 = 0.75
    val df = Seq((0.9, true), (0.7, true), (0.5, true), (0.7, false), (0.3, false))
      .toDF("score", "label")
    val r = Eval.auc(df).collect()(0)
    assert(r.getLong(0) === 3 && r.getLong(1) === 2)
    assert(r.getDouble(2) === 0.75)
  }

  test("auc of a perfect separator is 1, of an anti-separator 0") {
    import spark.implicits._
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("score", "label")
    assert(Eval.auc(perfect).collect()(0).getDouble(2) === 1.0)
    val anti = Seq((0.1, true), (0.9, false)).toDF("score", "label")
    assert(Eval.auc(anti).collect()(0).getDouble(2) === 0.0)
  }

  test("prCurve: recall is monotone non-decreasing as threshold drops; last row has recall 1") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.7, true), (0.5, true), (0.7, false), (0.3, false))
      .toDF("score", "label")
    val rows = Eval.prCurve(df).orderBy(col("thresh").desc).collect()
    val recalls = rows.map(_.getDouble(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(recalls.last === 1.0)
    // at thresh=0.9: tp=1 fp=0 → precision 1, recall 1/3
    assert(rows(0).getLong(1) === 1 && rows(0).getLong(2) === 0)
    assert(rows(0).getDouble(3) === 1.0)
  }

  test("targetEncode excludes the row itself and NULLs singletons") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 5.0))
      .toDF("event_id", "event_type", "value")
    val out = Eval.targetEncode(ev).orderBy("event_id").collect()
    // row 1: mean(20,30)=25; row 2: mean(10,30)=20; row 3: mean(10,20)=15
    assert(out(0).getDouble(2) === 25.0)
    assert(out(1).getDouble(2) === 20.0)
    assert(out(2).getDouble(2) === 15.0)
    assert(out(3).isNullAt(2)) // singleton category leaks nothing
  }

  test("featureBins: boundaries broadcast, bins partition the values") {
    import spark.implicits._
    val daily = (1 to 100).map(i => (1L, java.sql.Date.valueOf("2024-01-01"), i.toDouble))
      .toDF("user_id", "day", "v")
    val out = Eval.featureBins(daily).orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(1)).sum === 100)
    // quartiles of 1..100 → 25/25/25/25
    assert(out.map(_.getLong(1)).toSeq === Seq(25L, 25L, 25L, 25L))
  }

  test("featureBinsApprox: sampled bounds track the exact quartiles within the DKW regime") {
    import spark.implicits._
    // 2000 uniform values over [1, 2000]: a ~30% md5 sample's quantile
    // error is O(1/sqrt(600)) of the RANGE — bound generously at 10%
    val daily = (1 to 2000).map(i =>
      ((i % 40).toLong, java.sql.Date.valueOf(s"2024-0${i % 9 + 1}-0${i % 9 + 1}"), i.toDouble))
      .toDF("user_id", "day", "v")
    val out = Eval.featureBinsApprox(daily).orderBy("q").collect()
    assert(out.map(_.getAs[Double]("q")).toSeq === Seq(0.25, 0.5, 0.75))
    val nSample = out.head.getAs[Long]("n_sample")
    val nTotal = out.head.getAs[Long]("n_total")
    assert(nTotal === 2000L)
    assert(nSample > 400 && nSample < 800, s"~30% sample expected, got $nSample")
    out.foreach { r =>
      assert(r.getAs[Double]("abs_err") < 200.0,
        s"q=${r.getAs[Double]("q")}: abs_err=${r.getAs[Double]("abs_err")}")
    }
  }

  test("cdcLatest picks the (ts, event_id)-max row per key") {
    import spark.implicits._
    val t = (us: Long) => new java.sql.Timestamp(us)
    val ev = Seq(
      (1L, t(1000L), 7L, "a", 1.0),
      (1L, t(2000L), 5L, "b", 2.0),  // latest ts wins
      (2L, t(3000L), 1L, "c", 3.0),
      (2L, t(3000L), 2L, "d", 4.0))  // ts tie → higher event_id wins
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Relational.cdcLatest(ev).orderBy("user_id").collect()
    assert(out(0).getString(2) === "b")
    assert(out(1).getString(2) === "d")
  }

  test("scd2Intervals collapses runs with correct validity chain") {
    import spark.implicits._
    val t = (us: Long) => new java.sql.Timestamp(us)
    val ev = Seq(
      (1L, t(1000L), 1L, "a"), (1L, t(2000L), 2L, "a"),
      (1L, t(3000L), 3L, "b"),
      (1L, t(4000L), 4L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Relational.scd2Intervals(ev).orderBy("run_id").collect()
    assert(out.length === 3) // a-run, b-run, a-run (re-entry opens a NEW interval)
    assert(out.map(_.getString(2)).toSeq === Seq("a", "b", "a"))
    assert(out.map(_.getLong(5)).toSeq === Seq(2L, 1L, 1L))
    // validity chain: each valid_to equals the next valid_from; last open
    assert(out(0).getTimestamp(4) === out(1).getTimestamp(3))
    assert(out(1).getTimestamp(4) === out(2).getTimestamp(3))
    assert(out(2).isNullAt(4) && out(2).getBoolean(6))
  }

  test("ks: hand-computed CDF gap; perfect separation scores 1") {
    import spark.implicits._
    // negatives at scores .1/.2, positives at .8/.9 → KS = 1.0
    val sep = Seq((0.1, false), (0.2, false), (0.8, true), (0.9, true))
      .toDF("score", "label")
    val r = graft.operators.Eval.ks(sep).collect().head
    assert(r.getAs[Double]("ks") === 1.0)
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    // interleaved: scores .1(neg) .2(pos) .3(neg) .4(pos)
    // CDFs after each: F-=[.5,.5,1,1], F+=[0,.5,.5,1] → max gap 0.5
    val mix = Seq((0.1, false), (0.2, true), (0.3, false), (0.4, true))
      .toDF("score", "label")
    assert(graft.operators.Eval.ks(mix).collect().head.getAs[Double]("ks") === 0.5)
  }

  test("calibration: a perfectly calibrated score lands on the diagonal") {
    import spark.implicits._
    // bin 2 (score .25): 1 of 4 positive → pos_rate .25; bin 7 (.75): 3 of 4
    val rows = Seq.fill(3)((0.25, false)) ++ Seq((0.25, true)) ++
      Seq.fill(3)((0.75, true)) ++ Seq((0.75, false))
    val out = graft.operators.Eval.calibration(rows.toDF("score", "label"))
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 7L))
    assert(out(0).getAs[Double]("pos_rate") === 0.25)
    assert(out(1).getAs[Double]("pos_rate") === 0.75)
    assert(out(0).getAs[Double]("mean_score") === 0.25)
  }

  test("funnelSession: conversions must happen within ONE sitting; order is strict") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Long) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      // user 1, session A: view -> click -> purchase, all in order
      (1L, 1L, ts(0), "view"), (1L, 2L, ts(1), "click"), (1L, 3L, ts(2), "purchase"),
      // user 1, session B (2h later): view only
      (1L, 4L, ts(150), "view"),
      // user 2, one session: click BEFORE view — strict order stops at view
      (2L, 5L, ts(0), "click"), (2L, 6L, ts(1), "view"),
      // user 3: view in one session, click in the NEXT — must NOT convert
      (3L, 7L, ts(0), "view"), (3L, 8L, ts(200), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("value", lit(1.0))
    val out = Relational.funnelSession(ev, 1800000000L, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_sessions")).toMap
    // sessions with a view: 1A, 1B, 2's, 3's first, 3's second? (3's
    // second session has only click -> no stage 1) = 4 sessions
    assert(out(1L) === 4L, s"stage-1 sessions: $out")
    assert(out(2L) === 1L, "only 1A clicks after viewing in-session")
    assert(out(3L) === 1L, "only 1A purchases")
  }

  test("liftCurve: top-decile capture and lift on a hand frame; whole score groups per bucket") {
    import spark.implicits._
    // 10 distinct scores, positives at the top 3 scores
    val scored = (1 to 10).map(i => (i / 10.0, i >= 8)).toDF("score", "label")
    val out = Eval.liftCurve(scored).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 10)
    // bucket 0 = the single top score: capture 1/3, lift (1/1)/(3/10)
    assert(out(0L).getAs[Long]("n_pos") === 1L)
    assert(out(0L).getAs[Double]("capture") === 0.333)
    assert(out(0L).getAs[Double]("lift") === 3.333)
    assert(out(9L).getAs[Long]("n_pos") === 0L && out(9L).getAs[Double]("lift") === 0.0)
  }

  test("f1Best: hand-computed optimum; threshold ties break high") {
    import spark.implicits._
    // thresh 0.9: tp=1 fp=0 → f1 = 2/4 = .5; 0.8: tp=2 fp=0 → 4/5 = .8
    // 0.7: tp=2 fp=1 → 4/6 ≈ .667; 0.6: tp=3 fp=1 → 6/7 ≈ .857  ← best
    val scored = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, true))
      .toDF("score", "label")
    val r = Eval.f1Best(scored).collect().head
    assert(r.getAs[Double]("thresh") === 0.6)
    assert(r.getAs[Long]("tp") === 3L)
    assert(r.getAs[Long]("fp") === 1L)
    assert(r.getAs[Double]("f1") === math.floor(6.0 / 7.0 * 1000 + 0.5001) / 1000)
    // all-positive corpus: every threshold has fp=0; f1 strictly grows
    // with tp, so the best is the LOWEST threshold (tp = P) — and a
    // genuine tie (two thresholds, same f1) picks the higher one
    val tie = Seq((0.5, true), (0.5, true), (0.4, false), (0.3, false))
      .toDF("score", "label")
    val t = Eval.f1Best(tie).collect().head
    assert(t.getAs[Double]("thresh") === 0.5 && t.getAs[Double]("f1") === 1.0)
  }

  /** The md5 arm split, recomputed OUTSIDE Spark (java.security MD5 on
    * the same "ab:uid" string) — the independent check that the
    * assignment is the hash it claims to be.
    */
  private def armOf(uid: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ab:$uid".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % 2L).toInt
  }

  test("featureHash: buckets and signs match an independent md5; collisions sum signed") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 01:00:00") // a Friday → dow 6
    val rows = Seq((1L, ts, "view", 1.0), (1L, ts, "view", 1.0),
      (1L, ts, "purchase", 1.0)).toDF("user_id", "ts", "event_type", "value")
    def h(feat: String): (Long, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(feat.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 16,
        java.lang.Long.parseLong(hex.substring(8, 9), 16) % 2 * 2 - 1)
    }
    // feats: et:view ×2, et:purchase ×1, dow:6 ×3
    val expected = Seq("et:view", "et:view", "et:purchase", "dow:6", "dow:6", "dow:6")
      .map(h).groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val got = Eval.featureHash(rows, 16).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("v")).toMap
    assert(got === expected)
  }

  test("psi: identical halves score 0; a shifted half clears the 0.25 alarm bar") {
    import spark.implicits._
    // identical score distributions across parity → every bin has
    // n_a = n_b → contributions exactly 0
    val stable = (0L until 40L).map { i =>
      val nStop = (i / 2) % 5    // same profile both halves
      val text = (Seq.fill(nStop.toInt)("the") ++ Seq.fill(10)("word")).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val s = Eval.psi(stable, 4).collect()
    assert(s.forall(_.getAs[Double]("psi") === 0.0))
    // odd half saturated with stopwords → distribution shift
    val drifted = (0L until 40L).map { i =>
      val text = if (i % 2 == 0) Seq.fill(10)("word").mkString(" ")
      else (Seq.fill(8)("the") ++ Seq.fill(2)("word")).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val d = Eval.psi(drifted, 4).collect()
    assert(d.head.getAs[Double]("psi") > 0.25, s"psi = ${d.head.getAs[Double]("psi")}")
  }

  test("abLift: counts match an independent md5 partition; Wilson and z match closed form") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-05 01:00:00")
    // users 0-39; uid < 12 convert (one purchase), the rest only view
    val rows = (0L until 40L).flatMap { u =>
      Seq((u, ts, "view", 1.0)) ++
        (if (u < 12) Seq((u, ts, "purchase", 1.0)) else Nil)
    }.toDF("user_id", "ts", "event_type", "value")
    val r = Eval.abLift(rows, "purchase").collect().head
    val byArm = (0L until 40L).groupBy(armOf)
    val nA = byArm(0).size; val nB = byArm(1).size
    val cA = byArm(0).count(_ < 12); val cB = byArm(1).count(_ < 12)
    assert(r.getAs[Long]("n_a") === nA && r.getAs[Long]("n_b") === nB)
    assert(r.getAs[Long]("conv_a") === cA && r.getAs[Long]("conv_b") === cB)
    def r3(x: Double) = math.floor(x * 1000 + 0.5001) / 1000
    val (pa, pb) = (cA.toDouble / nA, cB.toDouble / nB)
    assert(r.getAs[Double]("rate_a") === r3(pa))
    assert(r.getAs[Double]("lift") === r3(pb - pa))
    val pp = (cA + cB).toDouble / (nA + nB)
    assert(r.getAs[Double]("z_stat") ===
      r3((pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / nA + 1.0 / nB))))
    val z = 1.96; val z2 = z * z
    val den = 1.0 + z2 / nA
    val center = (pa + z2 / (2.0 * nA)) / den
    val half = z * math.sqrt(pa * (1 - pa) / nA + z2 / (4.0 * nA * nA)) / den
    assert(r.getAs[Double]("lo_a") === r3(center - half))
    assert(r.getAs[Double]("hi_a") === r3(center + half))
    assert(r.getAs[Double]("lo_a") < pa && pa < r.getAs[Double]("hi_a"))
  }

  test("abCuped: a perfectly predictive covariate removes all variance and all false lift") {
    import spark.implicits._
    val pre = java.sql.Timestamp.valueOf("2024-01-05 01:00:00")
    val post = java.sql.Timestamp.valueOf("2024-01-20 01:00:00")
    // Y = 2X exactly for every user → theta = 2, var(Y − θX) = 0 →
    // var_reduction 1.0; adjusted means collapse to 2·mean(X) in BOTH
    // arms → lift_cuped 0 even though raw lift ≠ 0 (arm imbalance)
    val rows = (0L until 30L).flatMap { u =>
      val x = 1.0 + (u % 7).toDouble
      Seq((u, pre, "view", x), (u, post, "view", 2.0 * x))
    }.toDF("user_id", "ts", "event_type", "value")
    val r = Eval.abCuped(rows, "2024-01-16").collect().head
    assert(r.getAs[Double]("theta") === 2.0)
    assert(r.getAs[Double]("var_reduction") === 1.0)
    assert(r.getAs[Double]("lift_cuped") === 0.0)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 30L)
    // raw and adjusted per-arm means: yadj_a = yadj_b = 2·mean(X)
    assert(r.getAs[Double]("yadj_a") === r.getAs[Double]("yadj_b"))
  }
}
