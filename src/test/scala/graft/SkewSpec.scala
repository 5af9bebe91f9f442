package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling on the fact-join shape (q3/q7/q10: fact ⋈ fact
  * on a key a hot entity can dominate). Window-chain skew is a
  * different animal — a window partition is sequential per key and
  * AQE cannot split it (the soak's `sessionize_skew` entry measures
  * that cost and the mitigation is operator shape, e.g. skewSafeAgg's
  * salting) — but JOIN skew is exactly what AQE's OptimizeSkewedJoin
  * exists for, and this spec pins that our session config actually
  * lets it fire.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  test("AQE splits the hot-key side of a fact join; disabled control does not") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and lower the skew thresholds to the
      // test's data size (production defaults: 256MB / factor 5)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.shuffle.partitions", "8")
      // one orderkey owns ~83% of the fact side; the payload is an
      // incompressible md5 AND flows through the aggregate — a pruned
      // or constant column lz4-compresses below any skew threshold
      def h(i: Int) = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString
      val l = ((1 to 50000).map(i => (1L, i.toLong, h(i) + h(i + 1))) ++
        (1 to 10000).map(i => (2L + i % 100, i.toLong, h(i))))
        .toDF("l_orderkey", "l_linenumber", "pad")
      val o = (1L to 200L).map(k => (k, s"P$k")).toDF("o_orderkey", "o_p")
      def joined() = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"))
      val df = joined()
      assert(df.collect().head.getLong(0) === 60000L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition; plan:\n$plan")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val ctl = joined()
      ctl.collect()
      assert(!ctl.queryExecution.executedPlan.toString.contains("skew=true"))
    } finally saved.foreach { case (k, vOpt) =>
      vOpt match {
        case Some(v) => conf.set(k, v)
        case None => conf.unset(k)
      }
    }
  }

  // ── bounded-gap split-merge sessionization ──────────────────────

  private def events(rows: (Long, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "us", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("user_id", "session_no", "session_start_us", "session_end_us",
      "n_events", "sum_value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5))).sorted.toSeq

  test("split-merge: a session straddling a bucket boundary merges exactly") {
    // gap 100, bucket width 1000: user 1's events at 950 and 1050 are
    // in different buckets but 100... no, 100 >= gap breaks. Use
    // 950/1040 (gap 90 < 100 → one session across the boundary),
    // then 2000 (gap 960 → new session)
    val ev = events(
      (1L, 1L, 950L, 1.0), (1L, 2L, 1040L, 2.0), (1L, 3L, 2000L, 4.0))
    val out = rows(graft.operators.Relational.sessionizeSplitMerge(ev, 100L, 1000L))
    assert(out === Seq(
      (1L, 1L, 950L, 1040L, 2L, 3.0),
      (1L, 2L, 2000L, 2000L, 1L, 4.0)))
  }

  test("split-merge: a session chaining through WHOLE buckets reassembles, numbering survives merges") {
    // user 1: events every 50µs from 0 to 3000 — one true session
    // spanning 4 buckets of width 1000 (every bucket's single session
    // chains); then an isolated event at 10000 → session 2. user 2:
    // three sessions inside one bucket → interior path + numbering.
    val dense = (0L to 3000L by 50L).zipWithIndex.map { case (t, i) =>
      (1L, i.toLong, t, 1.0) }
    val ev = events(dense ++ Seq((1L, 999L, 10000L, 5.0),
      (2L, 1L, 100L, 1.0), (2L, 2L, 300L, 2.0), (2L, 3L, 500L, 3.0)): _*)
    val out = rows(graft.operators.Relational.sessionizeSplitMerge(ev, 100L, 1000L))
    val plain = rows(graft.operators.Relational.sessionize(ev, 100L))
    assert(out === plain)
    assert(out.filter(_._1 == 1L).map(_._2) === Seq(1L, 2L))
    assert(out.filter(_._1 == 2L).map(_._2) === Seq(1L, 2L, 3L))
    // the dense run really is ONE merged session with all 61 events
    assert(out.find(r => r._1 == 1L && r._2 == 1L).get._5 === 61L)
  }

  test("split-merge equals plain sessionize on a pseudo-random stream (any width)") {
    // 400 events over 5 users with md5-derived jittered gaps — the
    // result must be IDENTICAL to the plain path at several widths,
    // including a width smaller than the gap (width is only a load
    // knob, never a semantics knob)
    import spark.implicits._
    val ev0 = (0 until 400).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString
      val user = (Integer.parseInt(h.substring(0, 2), 16) % 5).toLong
      val t = i.toLong * 37L + (Integer.parseInt(h.substring(2, 5), 16) % 400).toLong
      (user, i.toLong, t, (Integer.parseInt(h.substring(5, 7), 16) % 10) / 3.0)
    }
    val ev = events(ev0: _*)
    val plain = rows(graft.operators.Relational.sessionize(ev, 120L))
    for (width <- Seq(60L, 500L, 5000L)) {
      assert(rows(graft.operators.Relational.sessionizeSplitMerge(ev, 120L, width))
        === plain, s"width=$width diverged from plain sessionize")
    }
  }
}
