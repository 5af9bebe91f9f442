package graft

/** Repeated-measurement harness for tuning: runs the named queries
  * `reps` times each and prints min/median — single-shot numbers in a
  * shared 32-thread JVM carry ±0.7s of JIT/GC noise, which is larger
  * than most of the effects being tuned. Usage:
  * `runMain graft.PerfProbe <reps> <query...>` (default 3 reps, the
  * current bench top-5).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("ts_metrics_overall", "dedup_minhash_lsh", "ts_forecast_baseline",
        "ts_trend_ma", "dedup_ngram_jaccard")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        // noop-write sink, same as Bench: a count() lets Catalyst
        // prune unreferenced projections and top-level sorts, so
        // projection-only queries probe as row-count scans
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $n%-24s min=${times.head}%6.2f med=${times(times.size / 2)}%6.2f reps=$reps")
    }
    spark.stop()
  }
}
