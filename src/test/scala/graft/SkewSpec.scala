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
}
