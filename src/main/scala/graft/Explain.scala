package graft

/** Plan auditor: prints the formatted physical plan of selected
  * queries so shuffle counts, pushed filters, pruned schemas and
  * WholeStageCodegen coverage can be reviewed (`runMain graft.Explain
  * [query ...]`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing", "q3_join_agg", "ts_trend_ma")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
