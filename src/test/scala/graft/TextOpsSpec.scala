package graft

import org.apache.spark.sql.SparkSession
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
}
