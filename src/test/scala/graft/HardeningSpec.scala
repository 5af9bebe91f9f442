package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs
import graft.operators.{Dedup, Relational, Similarity, TextOps, TimeSeries}

/** Round-4 hardening: native-expression parity twins, skew/typing
  * contracts, and cache hygiene.
  */
class HardeningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  val dir = "/root/testdata/sf0.001"

  private def r3c(c: org.apache.spark.sql.Column) = floor(c * 1000.0 + 0.5001) / 1000.0

  // ---------------- EWMA ----------------

  test("native graft_ewma matches the interpreted HOF fold on real series") {
    val daily = TimeSeries.resampleDaily(Tables.events(spark, dir))
    val native = TimeSeries.ewma(daily, 0.3).orderBy("user_id").collect()
    val hof = TimeSeries.ewmaHof(daily, 0.3).orderBy("user_id").collect()
    assert(native.length === hof.length)
    native.zip(hof).foreach { case (a, b) =>
      assert(a.getAs[Long]("user_id") === b.getAs[Long]("user_id"))
      // bit-exact, not ε-close: same fold arithmetic in the same order
      assert(a.getAs[Double]("ewma") === b.getAs[Double]("ewma"))
    }
  }

  test("graft_ewma null semantics replicate the aggregate fold exactly") {
    VectorExprs.register(spark)
    val cases = Seq(
      "array(1.0D, 2.0D, 3.0D)",
      "array(cast(null as double), 1.0D, 2.0D)", // leading null: reseed on first non-null
      "array(1.0D, cast(null as double), 2.0D)", // mid null: nullify then reseed
      "array(1.0D, 2.0D, cast(null as double))", // trailing null: NULL result
      "array(cast(null as double))",             // all-null: NULL
      "array_remove(array(1.0D), 1.0D)")         // empty: NULL
    cases.foreach { arr =>
      val row = spark.sql(
        s"""SELECT graft_ewma($arr, cast(0.3 as double)) AS native,
           |aggregate($arr, cast(null as double), (acc, x) ->
           |  CASE WHEN acc IS NULL THEN x ELSE acc * ${1 - 0.3} + x * 0.3 END) AS hof
           |""".stripMargin).collect().head
      assert(row.isNullAt(0) === row.isNullAt(1), s"null disagreement on $arr")
      if (!row.isNullAt(0))
        assert(row.getDouble(0) === row.getDouble(1), s"value disagreement on $arr")
    }
  }

  test("holt: constant series gives (const, 0); linear series trend approaches slope") {
    import spark.implicits._
    def daily(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => (1L, f"2020-01-${i + 1}%02d", v) }
      .toDF("user_id", "day", "v").withColumn("day", to_date(col("day")))
    val const = TimeSeries.holt(daily(Seq.fill(20)(42.0)), 0.5, 0.3, 5).collect().head
    assert(const.getAs[Double]("level") === 42.0)
    assert(const.getAs[Double]("trend") === 0.0)
    assert(const.getAs[Double]("forecast") === 42.0)
    // v_t = 10 + 3t: after 25 steps trend ~ 3, forecast tracks the line
    val lin = TimeSeries.holt(daily((0 until 25).map(t => 10.0 + 3.0 * t)), 0.5, 0.3, 5)
      .collect().head
    assert(math.abs(lin.getAs[Double]("trend") - 3.0) < 0.1)
    assert(math.abs(lin.getAs[Double]("forecast") - (10.0 + 3.0 * 29)) < 1.0)
    // single-element series seeds (v, 0)
    val one = TimeSeries.holt(daily(Seq(7.0)), 0.5, 0.3, 5).collect().head
    assert(one.getAs[Double]("level") === 7.0 && one.getAs[Double]("trend") === 0.0)
  }

  test("holtWinters: constant series stays flat; seasonal square wave is learned") {
    import spark.implicits._
    def daily(vs: Seq[Double]) = vs.zipWithIndex
      .map { case (v, i) => (1L, f"2020-01-${i + 1}%02d", v) }
      .toDF("user_id", "day", "v").withColumn("day", to_date(col("day")))
    // constant series: level = const, trend = 0, all seasonals stay 0,
    // so every forecast horizon returns the constant
    val const = TimeSeries.holtWinters(daily(Seq.fill(28)(42.0)), 0.5, 0.3, 0.4, 7, 5)
      .collect().head
    assert(const.getAs[Double]("level") === 42.0)
    assert(const.getAs[Double]("trend") === 0.0)
    assert(const.getAs[Double]("forecast") === 42.0)
    // period-2 square wave 10/20 with period=2: after enough cycles the
    // forecast at horizon 2 (same phase as the last value) tracks that
    // value far better than trend-only Holt can
    val wave = (0 until 30).map(t => if (t % 2 == 0) 10.0 else 20.0)
    val hw = TimeSeries.holtWinters(daily(wave), 0.3, 0.05, 0.6, 2, 2)
      .collect().head
    val lastVal = wave.last // t = 29, odd phase → 20; horizon 2 lands on odd phase
    assert(math.abs(hw.getAs[Double]("forecast") - lastVal) < 2.0,
      s"seasonal forecast ${hw.getAs[Double]("forecast")} should track $lastVal")
    // single element seeds (v, 0) with zero seasonals
    val one = TimeSeries.holtWinters(daily(Seq(7.0)), 0.5, 0.3, 0.4, 7, 3)
      .collect().head
    assert(one.getAs[Double]("level") === 7.0 && one.getAs[Double]("forecast") === 7.0)
    // degenerate period is a named error
    val e = intercept[Exception](
      TimeSeries.holtWinters(daily(Seq(1.0, 2.0)), 0.5, 0.3, 0.4, 1, 3).collect())
    assert(e.getMessage.contains("period"))
  }

  test("winsorize clamps to the per-key quantile band, interior untouched") {
    import spark.implicits._
    val daily = ((1 to 99).map(i => (1L, f"2020-01-01", i.toDouble)) :+ (1L, "2020-01-01", 1000.0))
      .zipWithIndex.map { case ((u, _, v), i) => (u, 1 + i, v) }
      .map { case (u, d, v) => (u, java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(d)), v) }
      .toDF("user_id", "day", "v")
    val out = TimeSeries.winsorize(daily, 0.05, 0.95).collect()
    val wins = out.map(_.getAs[Double]("v_wins"))
    // the 1000.0 outlier is capped at p95; interior values unchanged
    assert(wins.max < 1000.0)
    val mid = out.find(_.getAs[Double]("v") === 50.0).get
    assert(mid.getAs[Double]("v_wins") === 50.0)
    assert(wins.min >= out.map(_.getAs[Double]("v")).sorted.apply(4))
  }

  test("sampleStratified is deterministic and honors per-stratum rates") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i, i % 4)).toDF("id", "stratum")
    val keep = graft.operators.Relational
      .sampleStratified(rows, "id", (col("stratum") + 1L) * lit(20000L))
    val a = keep.collect().map(_.getLong(0)).toSet
    val b = graft.operators.Relational
      .sampleStratified(rows, "id", (col("stratum") + 1L) * lit(20000L))
      .collect().map(_.getLong(0)).toSet
    assert(a === b) // same sample every run, any partitioning
    val byStratum = keep.groupBy("stratum").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 3L).foreach { s =>
      val rate = (s + 1) * 0.2
      val got = byStratum.getOrElse(s, 0L) / 1000.0
      assert(math.abs(got - rate) < 0.06, s"stratum $s: got $got want ~$rate")
    }
  }

  // ---------------- IVF cell assignment ----------------

  test("map-only annIvfTopK matches the join+window formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, dir)
    // the round-3 reference formulation: BNLJ against the centroid set
    // + row_number argmax, then single-phase ranking
    val e = Similarity.prepared(emb)
    val c = Similarity.prepared(emb).where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    val assigned = e.join(broadcast(c))
      .withColumn("ccos", r3c(expr("graft_vec_dot(v, cv)") / (col("norm") * col("cnorm"))))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cid").as("cell"))
    val q = assigned.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("norm").as("qnorm"), col("cell"))
    val ref = assigned.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("vid"),
        r3c(expr("graft_vec_dot(v, qv)") / (col("norm") * col("qnorm"))).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))))
      .where(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val got = Similarity.annIvfTopK(emb, 16, 5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSet === ref.toSet)
  }

  test("IvfCell encode/decode round-trips and ties break to the smallest cid") {
    import graft.functions.IvfCell
    val enc = IvfCell.encode(Array(3L, 7L), Array(Array(1.0, 0.0), Array(1.0, 0.0)))
    val (cids, cents, norms) = IvfCell.decode(enc)
    assert(cids.toSeq === Seq(3L, 7L))
    assert(cents.map(_.toSeq).toSeq === Seq(Seq(1.0, 0.0), Seq(1.0, 0.0)))
    assert(norms.toSeq === Seq(1.0, 1.0))
    VectorExprs.register(spark)
    // identical centroids → identical rounded cosine → smallest cid
    val cell = spark.sql(
      s"SELECT graft_ivf_cell(array(cast(2.0 as float), cast(0.5 as float)), '$enc') AS cell")
      .collect().head.getLong(0)
    assert(cell === 3L)
  }

  test("graft_ivf_cells head equals graft_ivf_cell; nprobe=2 never worsens best cos") {
    import graft.functions.IvfCell
    VectorExprs.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.where(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Number](0).longValue(),
        r.getSeq[Number](1).map(_.doubleValue()).toArray))
      .sortBy(_._1)
    val enc = IvfCell.encode(cents.map(_._1), cents.map(_._2))
    val rows = emb
      .selectExpr("vec_id", s"graft_ivf_cell(embedding, '$enc') AS c1",
        s"graft_ivf_cells(embedding, '$enc', 2) AS c2")
      .collect()
    rows.foreach { r =>
      val c2 = r.getSeq[Long](2)
      assert(c2.length === 2)
      assert(c2.head === r.getLong(1), s"vec ${r.getLong(0)}: probe head != top-1 cell")
      assert(c2.head !== c2(1))
    }
    // superset candidates → per-query best cos can only improve
    val best1 = Similarity.annIvfTopK(emb, 16, 5, 5)
      .where(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val best2 = Similarity.annIvfTopKProbe(emb, 16, 5, 5, 2)
      .where(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    best1.foreach { case (qid, cos1) =>
      assert(best2(qid) >= cos1, s"qid $qid: nprobe=2 best cos regressed")
    }
  }

  test("semanticDedup drops exactly the lower-id-witnessed within-cell dups") {
    val emb = Tables.embeddings(spark, dir)
    VectorExprs.register(spark)
    // independent cell map: the BNLJ + row_number argmax formulation
    // (no IvfCell), same as the annIvfTopK parity test above
    val e = Similarity.prepared(emb)
    val c = Similarity.prepared(emb).where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    val cellOf = e.join(broadcast(c))
      .withColumn("ccos", r3c(expr("graft_vec_dot(v, cv)") / (col("norm") * col("cnorm"))))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))))
      .where(col("crank") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent pair generation: the brute-force exact verifier
    val pairs = Similarity.cosineDupPairs(emb, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val droppedRef = pairs.collect {
      case (a, b) if cellOf(a) == cellOf(b) => b // b = the higher id
    }.toSet
    val got = Similarity.semanticDedup(emb, 16, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length === emb.count(), "one row per vector")
    got.foreach { case (vid, cell, _) =>
      assert(cell === cellOf(vid), s"vec $vid: cell mismatch")
    }
    assert(got.filter(_._3).map(_._1).toSet === droppedRef)
    // the SemDeDup approximation must be OBSERVABLE on this data:
    // above-threshold pairs that cross cells exist and do NOT drop
    // their higher id (unless it has a separate within-cell witness)
    val crossOnly = pairs.collect {
      case (a, b) if cellOf(a) != cellOf(b) => b
    }.toSet -- droppedRef
    assert(crossOnly.nonEmpty, "dataset has no cross-cell dup pairs — test can't distinguish cell-restricted from brute-force dedup")
    // an empty codebook (no vec_id < nCentroids) must error, not
    // degrade to a single -1 cell holding the whole corpus
    val err = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(emb.where(col("vec_id") >= 16), 16, 0.3)
    }
    assert(err.getMessage.contains("codebook"))
  }

  test("semanticDecontaminate flags exactly the probe-cell cosine witnesses") {
    val emb = Tables.embeddings(spark, dir)
    VectorExprs.register(spark)
    // independent cell/probe map: BNLJ + row_number argmax, no IvfCell
    val e = Similarity.prepared(emb)
    val c = Similarity.prepared(emb).where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    val ranked = e.join(broadcast(c))
      .withColumn("ccos", r3c(expr("graft_vec_dot(v, cv)") / (col("norm") * col("cnorm"))))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))))
    val cellOf = ranked.where(col("crank") === 1)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probesOf = ranked.where(col("crank") <= 2)
      .select(col("vec_id"), col("cid"))
      .collect().groupBy(_.getLong(0)).map { case (v, rs) => v -> rs.map(_.getLong(1)).toSet }
    // brute-force reference: per training vector, max rounded cosine
    // (tie -> lowest bid) over benchmark vectors probing its cell
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Number](1).map(_.doubleValue()).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(d / (math.sqrt(na) * math.sqrt(nb)) * 1000.0 + 0.5001) / 1000.0
    }
    val benchIds = vecs.keys.filter(_ % 50 == 0).toSeq.sorted
    val corpusIds = vecs.keys.filter(_ % 50 != 0).toSeq.sorted
    val ref = corpusIds.map { vid =>
      val hits = benchIds.filter(b => probesOf(b).contains(cellOf(vid)))
        .map(b => (cos(vecs(vid), vecs(b)), b))
      val best = hits.sortBy { case (cs, b) => (-cs, b) }.headOption
      vid -> best
    }.toMap
    val got = Similarity.semanticDecontaminate(emb, 16, 2, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
    assert(got.length === corpusIds.length, "one row per non-benchmark vector")
    got.foreach { case (vid, cell, maxCos, bid, flagged) =>
      assert(cell === cellOf(vid), s"vec $vid: cell mismatch")
      assert(maxCos === ref(vid).map(_._1), s"vec $vid: max_cos mismatch")
      assert(bid === ref(vid).map(_._2), s"vec $vid: witness mismatch")
      assert(flagged === ref(vid).exists(_._1 >= 0.3), s"vec $vid: flag mismatch")
    }
    // non-trivial on this corpus: both outcomes occur, and at least
    // one witness reaches its training vector only through its SECOND
    // probe cell (the boundary case nprobe exists for)
    assert(got.exists(_._5) && got.exists(!_._5), "flags must be mixed")
    val viaSecondProbe = got.collect {
      case (vid, _, _, Some(bid), _) if cellOf(bid) != cellOf(vid) => (vid, bid)
    }
    assert(viaSecondProbe.nonEmpty,
      "no witness via the second probe cell — nprobe path unexercised")
    // benchmark vectors are never in the output
    assert(got.forall(_._1 % 50 != 0))
  }

  test("semanticDecontaminateStored: takedown masks both sides; parity with recompute on survivors") {
    val emb = Tables.embeddings(spark, dir)
    val t = "graft_decon_spec"
    try {
      Similarity.writeKnnGraph(emb, 16, 4, t, 4, 2)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getBoolean(4)))
      // untombstoned store == the recompute face exactly
      val full = rows(Similarity.semanticDecontaminateStored(spark, t, 2, 0.3))
      assert(full === rows(Similarity.semanticDecontaminate(emb, 16, 2, 0.3)))
      // benchmark vec 100 must be a live witness before the takedown,
      // or the bench-side masking below is unobservable
      assert(full.exists(_._4.contains(100L)), "vec 100 never witnesses — fixture too weak")
      val td = (col("vec_id") % 10 === 7 || col("vec_id") === 100) && col("vec_id") >= 16
      Similarity.deleteFromKnnGraph(emb.where(td).select(col("vec_id")), t)
      val masked = rows(Similarity.semanticDecontaminateStored(spark, t, 2, 0.3))
      // tombstoned corpus ids leave the report; the tombstoned
      // benchmark member stops witnessing anyone
      assert(masked.forall { case (vid, _, _, _, _) => !(vid % 10 == 7 && vid >= 16) })
      assert(masked.forall(!_._4.contains(100L)))
      // and the masked store == the recompute face over the SURVIVORS
      // (the takedown spares the codebook ids, so the pinned quantizer
      // equals the survivors' first-16 — the parity precondition)
      assert(masked === rows(Similarity.semanticDecontaminate(emb.where(!td), 16, 2, 0.3)))
    } finally {
      for (s <- Seq("nodes", "edges", "meta", "gtombstones"))
        spark.sql(s"DROP TABLE IF EXISTS ${t}_$s")
    }
  }

  // ---------------- rangeJoin skew + typing ----------------

  test("rangeJoin is exact under pathological long intervals (span >> width)") {
    import spark.implicits._
    val width = 100L
    val points = (0L until 2000L by 7).map(t => (t, s"p$t")).toDF("t", "pname")
    // interval 1 spans 1000 buckets (100000/width), interval 2 spans 1
    val intervals = Seq((1L, 0L, 100000L), (2L, 500L, 520L), (3L, 1800L, 1900L))
      .toDF("iid", "start", "end")
    val got = Relational.rangeJoin(points, "t", intervals, "start", "end", width)
      .select("pname", "iid").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .where(col("t") >= col("start") && col("t") <= col("end"))
      .select("pname", "iid").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === naive)
    // the documented cost contract: the interval side explodes into
    // exactly span/width + 1 bucket rows — the "raise width or split"
    // guidance in the docstring is about THIS factor
    def nBuckets(s: Long, e: Long) = e / width - s / width + 1
    assert(nBuckets(0L, 100000L) === 1001L)
    assert(nBuckets(500L, 520L) === 1L)
    val totalExplode = Seq((0L, 100000L), (500L, 520L), (1800L, 1900L))
      .map { case (s, e) => nBuckets(s, e) }.sum
    assert(totalExplode <= 100000L / width + intervals.count() + 2)
  }

  test("rangeJoin accepts double-typed point/interval columns (cast, not fail)") {
    import spark.implicits._
    val points = Seq((10.5, "a"), (250.0, "b"), (999.9, "c")).toDF("t", "pname")
    val intervals = Seq((1L, 10.0, 260.0)).toDF("iid", "start", "end")
    val got = Relational.rangeJoin(points, "t", intervals, "start", "end", 64L)
      .select("pname").collect().map(_.getString(0)).toSet
    assert(got === Set("a", "b"))
  }

  // ---------------- streaming dedup batch twin ----------------

  test("dedupStreamBatch keeps min-ts row per key, tie-broken by event_id") {
    import spark.implicits._
    val events = Seq(
      (1L, "click", 11L, "2020-01-01 00:00:05"),
      (1L, "click", 10L, "2020-01-01 00:00:05"), // ts tie → keep event_id 10
      (1L, "click", 9L, "2020-01-01 00:00:09"),
      (1L, "error", 20L, "2020-01-01 00:00:01"),
      (2L, "click", 30L, "2020-01-01 00:00:02"))
      .toDF("user_id", "event_type", "event_id", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = graft.streaming.StreamOps
      .dedupStreamBatch(events, Seq("user_id", "event_type"))
      .orderBy("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "click", 10L), (1L, "error", 20L), (2L, "click", 30L)))
  }

  test("tfidf ranks the rare term above corpus-wide terms") {
    import spark.implicits._
    // "rare" appears only in doc 1; "common" everywhere (idf = ln(1) = 0)
    val d = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common other other")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.tfidf(d, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._4)
    assert(doc1.head._2 === "rare")
    assert(doc1.head._3 > 0.0)
    // a term present in every doc scores exactly 0
    assert(out.filter(_._2 == "common").forall(_._3 === 0.0))
  }

  // ---------------- NULL-sig LSH contract ----------------

  test("lshCandidatesFast drops NULL signatures instead of colliding them") {
    VectorExprs.register(spark)
    // docs 1 & 2: empty shingle sets → NULL sigs; docs 3 & 4 identical
    val sigs = spark.sql(
      """SELECT 1L AS doc_id, graft_minhash(array_remove(array('x'), 'x'), 16) AS sig
        |UNION ALL SELECT 2L, graft_minhash(array_remove(array('x'), 'x'), 16)
        |UNION ALL SELECT 3L, graft_minhash(array('a b c', 'b c d'), 16)
        |UNION ALL SELECT 4L, graft_minhash(array('a b c', 'b c d'), 16)""".stripMargin)
    val cand = Dedup.lshCandidatesFast(sigs, 2, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSet === Set((3L, 4L))) // no (1,2) ""-signature collision
    // jaccardEstimate also drops NULL-sig pairs rather than emitting NULL
    val pairs = spark.sql("SELECT 1L AS doc_a, 2L AS doc_b UNION ALL SELECT 3L, 4L")
    val est = Dedup.jaccardEstimate(sigs, pairs, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(est.toSet === Set((3L, 4L)))
  }

  test("native expressions: interpreted eval matches codegen bit-for-bit") {
    // every gate that routes through a graft native Expression
    // (VecDot/LshBucket/MinHashSig/SimHash64/RollingHash31/EwmaFold/
    // HoltFold/IvfCell): run once under whole-stage codegen (doGenCode
    // path) and once with codegen disabled (nullSafeEval path) — a
    // divergence here is the classic hand-rolled-expression bug class
    val names = Seq("ts_ewma", "ts_holt", "dedup_simhash", "doc_fingerprint",
      "ann_ivf", "ann_ivf_probe", "ann_lsh", "dedup_minhash_lsh",
      "text_repetition", "text_filter", "ann_pq", "ann_ivfpq", "doc_winnow")
    names.foreach { name =>
      val codegen = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val interpreted = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted
        assert(codegen.sameElements(interpreted), s"$name: codegen vs interpreted divergence")
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("kmeans training descends the codebook distortion on the real corpus") {
    val emb = Tables.embeddings(spark, dir)
    val seed = graft.operators.Similarity.kmeansCentroids(emb, 8, 0)
    val trained = graft.operators.Similarity.kmeansCentroids(emb, 8, 3)
    val before = graft.operators.Similarity.kmeansInertia(emb, seed)
    val after = graft.operators.Similarity.kmeansInertia(emb, trained)
    // Lloyd descends mean distortion; per-round 1e-3 centroid rounding
    // can only wobble it at that scale, far below the real improvement
    assert(after < before,
      s"training must reduce distortion: seed $before -> trained $after")
  }

  // ---------------- cache hygiene ----------------

  test("operators leave no cacheManager entries behind") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    val ev = Tables.events(spark, dir)

    TimeSeries.forecastBaseline(ev, 3, 10, 5).count()
    assert(cm.isEmpty, "forecastBaseline leaked a cache entry")

    TimeSeries.metricsOverall(TimeSeries.forecastBaseline(ev, 3, 10, 5)).count()
    assert(cm.isEmpty, "metricsOverall leaked a cache entry")

    Dedup.pipeline(Tables.documents(spark, dir), 16, 2, 0.5).count()
    assert(cm.isEmpty, "Dedup.pipeline leaked a cache entry")

    SparkEntry.queries("dedup_jaccard_est")(spark, dir).count()
    assert(cm.isEmpty, "dedup_jaccard_est entry leaked a cache entry")

    val docs = Tables.documents(spark, dir)
    Dedup.crossDup(docs.where(col("doc_id") % 2 === 1),
      docs.where(col("doc_id") % 2 === 0), 16, 2, 0.5).count()
    assert(cm.isEmpty, "crossDup leaked a cache entry")

    graft.operators.Corpus.pipeline(docs, docs.where(col("doc_id") % 50 === 0)).count()
    assert(cm.isEmpty, "Corpus.pipeline leaked a cache entry")

    // the checkpoint-based text ops never register cacheManager entries
    TextOps.lmScore(docs).count()
    TextOps.lmScoreBigram(docs).count()
    TextOps.bm25(docs, Seq("hash", "join"), 5).count()
    assert(cm.isEmpty, "checkpoint-based text ops leaked a cache entry")

    // r9: the stored-index path persists the crawl sigs internally
    Dedup.writeBandIndex(docs.where(col("doc_id") % 2 === 0), 16, 2, "graft_hyg_idx", 2)
    assert(cm.isEmpty, "writeBandIndex leaked a cache entry")
    try {
      Dedup.crossDupAgainstIndex(docs.where(col("doc_id") % 2 === 1),
        "graft_hyg_idx", 16, 2, 0.5).count()
      assert(cm.isEmpty, "crossDupAgainstIndex leaked a cache entry")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_hyg_idx_bands")
      spark.sql("DROP TABLE IF EXISTS graft_hyg_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS graft_hyg_idx_meta")
    }

    // r9: the lm-band pipeline's shared tokenized checkpoint is a
    // leaf, not a cache entry
    graft.operators.Corpus.pipeline(docs, docs.where(col("doc_id") % 50 === 0),
      lmScoreBand = Some((-3.41, -3.39))).count()
    assert(cm.isEmpty, "Corpus.pipeline(lm band) leaked a cache entry")
  }

  // ---------------- round-11 third block ----------------

  test("zorder rejects out-of-range bits and non-positive files eagerly") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException](graft.operators.Layout.zorder(df, "x", "y", bits = 0))
    intercept[IllegalArgumentException](graft.operators.Layout.zorder(df, "x", "y", bits = 21))
    intercept[IllegalArgumentException](graft.operators.Layout.zorder(df, "x", "y", files = 0))
  }

  test("pivotDaily rejects an empty type list; lagFeatures empty lags") {
    import spark.implicits._
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    intercept[IllegalArgumentException](Relational.pivotDaily(ev, Seq.empty))
    intercept[IllegalArgumentException](TimeSeries.lagFeatures(
      ev.select(col("user_id"), to_date(col("ts")).as("day"), col("value").as("v")),
      Seq.empty, 3))
  }

  test("harmonics and stationarity survive degenerate single-row series") {
    import spark.implicits._
    val one = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 4.0))
      .toDF("user_id", "day", "v")
    // N = 1: theta = 2πk·0/1 = 0 → a_k = 2·v, b_k = 0 — defined, no crash
    val h = TimeSeries.harmonics(one, 2).orderBy("k").collect()
    assert(h.length === 2)
    assert(h(0).getAs[Double]("a_k") === 8.0)
    assert(h(0).getAs[Double]("b_k") === 0.0)
    // single row: 2·0 < 1 → the row lands in half 0; second half
    // empty → mu2/var2 null, ratios null
    val s = TimeSeries.stationarity(one).collect().head
    assert(s.getAs[Double]("mu1") === 4.0)
    assert(s.isNullAt(s.fieldIndex("mu2")))
    assert(s.isNullAt(s.fieldIndex("var_ratio")))
  }

  test("dupSpanRatio drops docs shorter than k; funnel of 1-type stream empty-safe") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val out = TextOps.dupSpanRatio(docs, 5).collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L)) // doc 1 has no 5-gram
  }

  test("activeUsersRolling window of 1 day degenerates to DAU") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 01:00:00")))
      .toDF("user_id", "ts")
    Relational.activeUsersRolling(ev, 1).collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2), "1-day window must equal DAU")
    }
  }
}
