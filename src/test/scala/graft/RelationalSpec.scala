package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Generate, Relational}

class RelationalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  test("asofJoin picks latest right row <= left time, inclusive, left-outer") {
    import spark.implicits._
    val left = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), 10.0),
      (1L, java.sql.Date.valueOf("2024-01-05"), 20.0),
      (1L, java.sql.Date.valueOf("2024-01-09"), 30.0),
      (2L, java.sql.Date.valueOf("2024-01-02"), 40.0))
      .toDF("user_id", "day", "v")
    val right = Seq(
      (1L, java.sql.Date.valueOf("2024-01-03"), 1.0),
      (1L, java.sql.Date.valueOf("2024-01-05"), 2.0),
      (1L, java.sql.Date.valueOf("2024-01-08"), 3.0))
      .toDF("user_id", "day", "err_v")
    val out = Relational.asofJoin(left, right, "user_id", "day", Seq("err_v"))
      .orderBy("user_id", "day")
      .select("user_id", "day", "v", "asof_err_v")
      .collect()
    assert(out.length === 4) // left preserved
    assert(out(0).isNullAt(3))                      // 01-01: no prior error
    assert(out(1).getDouble(3) === 2.0)             // 01-05: same-day inclusive
    assert(out(2).getDouble(3) === 3.0)             // 01-09: latest prior
    assert(out(3).isNullAt(3))                      // user 2: none
  }

  test("asofJoinForward mirrors backward; asofJoinNearest picks the closer side, backward on ties") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val left = Seq(
      (1L, d("2024-01-01"), 10.0),   // fwd-only: nearest = 01-03
      (1L, d("2024-01-04"), 15.0),   // tie (03 vs 05) → backward 03
      (1L, d("2024-01-05"), 20.0),   // exact hit both sides
      (1L, d("2024-01-10"), 30.0),   // back 5 days vs fwd 2 → forward 12
      (1L, d("2024-01-20"), 40.0))   // back-only: nearest = 01-12
      .toDF("user_id", "day", "v")
    val right = Seq(
      (1L, d("2024-01-03"), 1.0, d("2024-01-03")),
      (1L, d("2024-01-05"), 2.0, d("2024-01-05")),
      (1L, d("2024-01-12"), 3.0, d("2024-01-12")))
      .toDF("user_id", "day", "err_v", "err_day")
    val fwd = Relational.asofJoinForward(left, right, "user_id", "day", Seq("err_v"))
      .orderBy("day").select("asof_err_v").collect()
    assert(fwd.map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq ===
      Seq(1.0, 2.0, 2.0, 3.0, null))
    val near = Relational.asofJoinNearest(left, right, "user_id", "day",
        "err_day", Seq("err_v", "err_day"))
      .orderBy("day").select("near_err_v").collect()
    assert(near.map(_.getDouble(0)).toSeq === Seq(1.0, 1.0, 2.0, 3.0, 3.0))
  }

  test("churnWeekly: growth accounting per week; the last week's churn is NULL, not zero") {
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"2024-01-$d 10:00:00")
    // weeks of 2024-01: w1 = Jan 1, w2 = Jan 8, w3 = Jan 15
    val rows = Seq(
      (1L, ts("02")), (1L, ts("09")), (1L, ts("16")),   // never churns
      (2L, ts("03")),                                   // churns after w1
      (3L, ts("10")), (3L, ts("17")))                   // new in w2
      .toDF("user_id", "ts").withColumn("value", lit(1.0))
    val out = Relational.churnWeekly(rows).orderBy("week").collect()
    def row(i: Int) = (out(i).getAs[Long]("n_active"),
      if (out(i).isNullAt(out(i).fieldIndex("n_churned"))) -1L
      else out(i).getAs[Long]("n_churned"),
      out(i).getAs[Long]("n_new"))
    assert(out.length === 3)
    assert(row(0) === ((2L, 1L, 2L)))
    assert(out(0).getAs[Double]("churn_rate") === 0.5)
    assert(row(1) === ((2L, 0L, 1L)))
    assert(row(2) === ((2L, -1L, 0L)))   // last week: churn NULL
    assert(out(2).isNullAt(out(2).fieldIndex("churn_rate")))
  }

  test("funnelLatency: per-transition converter counts and exact latency percentiles") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-05 10:00:00").getTime
    def ts(offsetS: Long) = new java.sql.Timestamp(t0 + offsetS * 1000)
    // A converts fully (10s then 20s); B stops after click (30s); C
    // clicks without signup (never enters the ladder)
    val rows = Seq(
      (1L, ts(0), "signup", 1.0), (1L, ts(10), "click", 1.0), (1L, ts(30), "purchase", 1.0),
      (2L, ts(0), "signup", 1.0), (2L, ts(30), "click", 1.0),
      (3L, ts(5), "click", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Relational.funnelLatency(rows, Seq("signup", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("step") -> r).toMap
    assert(out(1).getAs[String]("transition") === "signup->click")
    assert(out(1).getAs[Long]("n_converted") === 2L)
    assert(out(1).getAs[Double]("mean_s") === 20.0)
    assert(out(1).getAs[Double]("p50_s") === 20.0)
    assert(out(1).getAs[Double]("p90_s") === 28.0) // interp of [10, 30] at .9
    assert(out(2).getAs[Long]("n_converted") === 1L)
    assert(out(2).getAs[Double]("p50_s") === 20.0)
  }

  test("sessionize splits on gaps > threshold") {
    import spark.implicits._
    val base = 1700000000000000L // µs
    val m = 60L * 1000000L
    val ev = Seq(
      (1L, 1L, base, 1.0), (2L, 1L, base + 5 * m, 2.0),     // session 1
      (3L, 1L, base + 60 * m, 3.0),                         // session 2 (55min gap)
      (4L, 2L, base, 4.0))                                  // user 2 session 1
      .toDF("event_id", "user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val s = Relational.sessionize(ev, 30L * 60L * 1000000L)
      .orderBy("user_id", "session_no").collect()
    assert(s.length === 3)
    assert(s(0).getAs[Long]("n_events") === 2)
    assert(s(1).getAs[Long]("n_events") === 1)
    assert(s(2).getAs[Long]("n_events") === 1)
  }

  test("pathTopK: gap-split sessions yield ranked full paths") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // user 1: [a,b] then a 2h gap then [a,b]; user 2: [a,b]; user 3: [c]
    val ev = Seq(
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"),
      (1L, 3L, ts(180), "a"), (1L, 4L, ts(181), "b"),
      (2L, 5L, ts(0), "a"), (2L, 6L, ts(1), "b"),
      (3L, 7L, ts(0), "c"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Relational.pathTopK(ev, 1800000000L, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a>b", 3L, 1L), ("c", 1L, 2L)))
  }

  test("revenueCube: all four grouping levels, exact sums, gid bit order") {
    import spark.implicits._
    val orders = Seq(
      (1L, "O", "1-URGENT", 100.10),
      (2L, "O", "2-HIGH", 200.20),
      (3L, "F", "1-URGENT", 300.30),
      (4L, "F", "1-URGENT", 400.40))
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
    val rows = Relational.revenueCube(orders).collect()
      .map(r => (Option(r.getAs[String]("o_orderstatus")),
        Option(r.getAs[String]("o_orderpriority")),
        r.getAs[Long]("gid"), r.getAs[Long]("n_orders"),
        r.getAs[Double]("revenue"))).toSet
    // 3 cells + 2 status subtotals + 2 priority subtotals + grand = 8
    assert(rows.size === 8)
    assert(rows.contains((Some("F"), Some("1-URGENT"), 0L, 2L, 700.70)))
    // gid bit order: first cube column (status) is the MSB —
    // status subtotal (priority rolled up) = gid 1, priority = gid 2
    assert(rows.contains((Some("O"), None, 1L, 2L, 300.30)))
    assert(rows.contains((None, Some("1-URGENT"), 2L, 3L, 800.80)))
    assert(rows.contains((None, None, 3L, 4L, 1001.00)))
  }

  test("topKPerGroup returns k rows per group, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 7.0), ("b", 4L, 1.0))
      .toDF("g", "id", "x")
    val t = Relational.topKPerGroup(df, "g", "x", "id", 2)
      .orderBy("g", "rank").collect()
    assert(t.map(_.getLong(1)).toSeq === Seq(2L, 3L, 4L))
  }

  test("skewSafeAgg equals the plain aggregation") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val safe = Relational.skewSafeAgg(ev, "event_type", "value", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(safe === plain)
  }

  test("generate is deterministic and correctly shaped") {
    val a = Generate.series(spark, 5, 50, 30).collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val b = Generate.series(spark, 5, 50, 30).collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(a.toSet === b.toSet)
    assert(a.length === 250)
    // signal types cycle by key % 4 (sine, saw, tri, square)
    val st = Generate.series(spark, 5, 1, 30).orderBy("key").collect().map(_.getAs[Int]("signal_type"))
    assert(st.toSeq === Seq(0, 1, 2, 3, 0))
  }

  test("fast-sine approximation stays within 0.2% of libm sine") {
    // the exact expression Generate/OracleSql share, evaluated over a
    // full cycle — folded parabola + cubic refinement
    val rows = spark.range(0, 1000).selectExpr("CAST(id AS DOUBLE) / 1000.0 AS tt")
      .selectExpr("tt", "CASE WHEN tt < 0.5 THEN tt ELSE tt - 0.5 END AS u0")
      .selectExpr("tt", "(CASE WHEN tt < 0.5 THEN 1.0 ELSE -1.0 END) * ((u0 * (0.5 - u0)) * 16.0) AS q")
      .selectExpr("tt", "(q * 0.775) + ((q * ABS(q)) * 0.225) AS s")
      .collect()
    rows.foreach { r =>
      val tt = r.getDouble(0)
      val s = r.getDouble(1)
      assert(math.abs(s - math.sin(2 * math.Pi * tt)) < 0.002,
        s"fast sine off at tt=$tt")
    }
  }

  test("rangeJoin keeps exact buckets for values above 2^53 (ns epochs)") {
    import spark.implicits._
    // nanosecond-scale epochs: double division would corrupt bucket ids
    val base = 1700000000000000000L // ~1.7e18, not representable ± 1 in double
    val points = Seq((base + 1L, "a"), (base + 999L, "b"), (base + 2000L, "c"))
      .toDF("t", "pname")
    val intervals = Seq((1L, base, base + 1000L)).toDF("iid", "start", "end")
    val got = Relational.rangeJoin(points, "t", intervals, "start", "end", 128L)
      .select("pname").collect().map(_.getString(0)).toSet
    assert(got === Set("a", "b"))
  }

  test("rangeJoin with equi-keys only matches same-key rows") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 5L)).toDF("k", "t")
    val intervals = Seq((1L, 0L, 10L)).toDF("k", "start", "end")
    val got = Relational.rangeJoin(points, "t", intervals, "start", "end", 4L, Seq("k"))
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("bucketed rangeJoin equals the naive cross-join filter") {
    import spark.implicits._
    val points = (0L to 100L by 3).map(t => (t, s"p$t")).toDF("t", "pname")
    val intervals = Seq((0L, 5L, 10L), (1L, 8L, 30L), (2L, 90L, 95L), (3L, 40L, 41L))
      .toDF("iid", "start", "end")
    val fast = Relational.rangeJoin(points, "t", intervals, "start", "end", 7L)
      .select("t", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .where(col("t") >= col("start") && col("t") <= col("end"))
      .select("t", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
    // no duplicate matches despite intervals spanning several buckets
    val cnt = Relational.rangeJoin(points, "t", intervals, "start", "end", 7L).count()
    assert(cnt === fast.size)
  }

  test("funnel: strict ordering enforced, out-of-order stages do not count") {
    import spark.implicits._
    // A completes in order; B purchases BEFORE clicking (purchase must
    // not count); C only signs up; D clicks without signing up (not in
    // the funnel at all)
    val rows = Seq(
      ("A", "signup", 10), ("A", "click", 20), ("A", "purchase", 30),
      ("B", "signup", 10), ("B", "purchase", 15), ("B", "click", 20),
      ("C", "signup", 10),
      ("D", "click", 10), ("D", "purchase", 20)
    ).map { case (u, t, sec) =>
      (u.hashCode.toLong, t, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec)))
    }
    val events = rows.toDF("user_id", "event_type", "ts")
    val out = Relational.funnel(events, Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Any]("t2_us") != null, r.getAs[Any]("t3_us") != null,
          r.getLong(r.fieldIndex("stage")))).toMap
    assert(out.keySet === Set("A", "B", "C").map(_.hashCode.toLong))
    assert(out("A".hashCode.toLong) === ((true, true, 3L)))
    assert(out("B".hashCode.toLong) === ((true, false, 2L)))
    assert(out("C".hashCode.toLong) === ((false, false, 1L)))
    // conversion deadline: A's click came 10s after signup — with a
    // 5-second window it no longer counts (and purchase, which
    // depends on the click, falls with it)
    val windowed = Relational.funnel(events, Seq("signup", "click", "purchase"),
        maxGapUs = Some(5000000L))
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("stage"))).toMap
    assert(windowed("A".hashCode.toLong) === 1L)
    // with a 15-second window the full ladder fits again
    val wide = Relational.funnel(events, Seq("signup", "click", "purchase"),
        maxGapUs = Some(15000000L))
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("stage"))).toMap
    assert(wide("A".hashCode.toLong) === 3L)
  }

  test("retention: cohort triangle counts returning users per week offset") {
    import spark.implicits._
    def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 12:00:00")
    // weeks: 2024-01-01 (Mon), 2024-01-08, 2024-01-15
    val events = Seq(
      (1L, ts("2024-01-02")), (1L, ts("2024-01-09")), (1L, ts("2024-01-16")),
      (2L, ts("2024-01-03")), (2L, ts("2024-01-17")),
      (3L, ts("2024-01-10"))
    ).toDF("user_id", "ts")
    val out = Relational.retention(events)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      ("2024-01-01", 0L, 2L),  // users 1,2 start week 0
      ("2024-01-01", 1L, 1L),  // user 1 returns in week 1
      ("2024-01-01", 2L, 2L),  // users 1,2 in week 2
      ("2024-01-08", 0L, 1L))) // user 3's own cohort
  }

  test("pathTransitions: per-user consecutive pairs, P(next|prev) normalized") {
    import spark.implicits._
    val base = 1700000000000000L
    val ev = Seq(
      // user 1: a -> b -> a -> c ; user 2: a -> b
      (1L, 1L, base, "a"), (2L, 1L, base + 1, "b"),
      (3L, 1L, base + 2, "a"), (4L, 1L, base + 3, "c"),
      (5L, 2L, base, "a"), (6L, 2L, base + 1, "b"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val out = Relational.pathTransitions(ev)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // from 'a': 2× a->b, 1× a->c; from 'b': 1× b->a
    assert(out(("a", "b")) === ((2L, 0.667)))
    assert(out(("a", "c")) === ((1L, 0.333)))
    assert(out(("b", "a")) === ((1L, 1.0)))
    // first event of each user contributes no pair: 4 transitions total
    assert(out.values.map(_._1).sum === 4L)
  }

  test("activeUsersRolling: DAU exact, trailing window unions distinct users") {
    import spark.implicits._
    def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 10:00:00")
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-01")), // same user twice a day
      (2L, ts("2024-01-01")),
      (2L, ts("2024-01-02")),
      (3L, ts("2024-01-05")))
      .toDF("user_id", "ts")
    val out = Relational.activeUsersRolling(ev, 3)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("2024-01-01") === ((2L, 2L)))            // users 1,2
    assert(out("2024-01-02") === ((1L, 2L)))            // window: 01+02 → {1,2}
    assert(out("2024-01-05") === ((1L, 1L)))            // 03/04 outside window
    assert(out.size === 3)                              // only active days listed
  }

  test("activeUsersRollingApprox: HLL estimate within the m=64 error regime at three scales") {
    import spark.implicits._
    def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 10:00:00")
    // 1.04/sqrt(64) = 13% standard error — pin a 3-sigma-ish bound at
    // three cardinality decades on the same 64-register budget (the
    // flat-state claim: register rows per window = 64 regardless)
    for (n <- Seq(50, 500, 5000)) {
      val ev = (0 until n).map(u => (u.toLong + 1000L * n, ts("2024-01-01")))
        .toDF("user_id", "ts")
      val r = Relational.activeUsersRollingApprox(ev, 3).collect().head
      val exact = r.getAs[Long]("rolling_users")
      val err = r.getAs[Double]("rel_err")
      assert(exact === n.toLong)
      assert(err < 0.4, s"n=$n rel_err=$err beyond the m=64 regime")
    }
  }

  test("zorder: Morton interleave on a 4x4 grid, contiguous file ranges") {
    import spark.implicits._
    val grid = for { x <- 0 to 3; y <- 0 to 3 } yield (x.toLong, y.toLong)
    val z = graft.operators.Layout.zorder(
        grid.toDF("x", "y"), "x", "y", bits = 2, files = 4)
      .collect().map(r => (r.getLong(r.fieldIndex("bin_x")),
        r.getLong(r.fieldIndex("bin_y"))) -> r.getLong(r.fieldIndex("zval"))).toMap
    // bins = values (span 4 over 4 bins); classic Morton codes
    assert(z((0L, 0L)) === 0L)
    assert(z((1L, 0L)) === 1L)
    assert(z((0L, 1L)) === 2L)
    assert(z((1L, 1L)) === 3L)
    assert(z((2L, 3L)) === 14L)
    assert(z((3L, 3L)) === 15L)
    assert(z.values.toSeq.sorted === (0L to 15L))       // bijective on the grid
    // summary: each of the 4 files covers a 2x2 rectangle — BOTH
    // dimensions prune, which is the whole point of z-ordering
    val s = graft.operators.Layout.zorderSummary(
        grid.toDF("x", "y"), "x", "y", bits = 2, files = 4)
      .collect()
    assert(s.length === 4)
    s.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_rows")) === 4L)
      assert(r.getLong(r.fieldIndex("max_bx")) - r.getLong(r.fieldIndex("min_bx")) === 1L)
      assert(r.getLong(r.fieldIndex("max_by")) - r.getLong(r.fieldIndex("min_by")) === 1L)
    }
  }

  test("sessionStats: counts, mean events and mean duration per user") {
    import spark.implicits._
    val t = (s: Long) => new java.sql.Timestamp(s * 1000L)
    // user 1: session A = 3 events over 10s, session B (after a >30s
    // gap) = 1 event → 2 sessions, avg 2 events, avg duration 5s
    val ev = Seq(
      (1L, 1L, t(100), 1.0), (1L, 2L, t(105), 1.0), (1L, 3L, t(110), 1.0),
      (1L, 4L, t(200), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val r = Relational.sessionStats(ev, 30000000L).collect().head
    assert(r.getAs[Long]("n_sessions") === 2L)
    assert(r.getAs[Double]("avg_events") === 2.0)
    assert(r.getAs[Double]("avg_duration_s") === 5.0)
  }

  test("sampleFixedPerStratum: exactly k per stratum, deterministic across reruns") {
    import spark.implicits._
    val d = (0L until 40L).map(i => (i, s"s${i % 2}", "txt")).toDF("doc_id", "source", "text")
    val a = Relational.sampleFixedPerStratum(d, 5, "panel").collect()
    assert(a.groupBy(_.getString(1)).forall(_._2.length == 5))
    val b = Relational.sampleFixedPerStratum(d, 5, "panel").collect()
    assert(a.map(_.getLong(0)).sorted.toSeq === b.map(_.getLong(0)).sorted.toSeq)
    // a different seed draws a different panel
    val c = Relational.sampleFixedPerStratum(d, 5, "other").collect()
    assert(a.map(_.getLong(0)).sorted.toSeq !== c.map(_.getLong(0)).sorted.toSeq)
  }
}
