package graft

/** Repeated-measurement harness for tuning AND the cheap cross-check
  * when a full Bench run looks contention-poisoned: runs the named
  * queries `reps` times each, prints min/median per query, and emits
  * one JSON line (written to `SPARK_GRAFT_PROBE_OUT` too, if set —
  * that is how `PROBE_r{N}.json` is produced). Single-shot numbers in
  * a shared 32-thread JVM carry ±0.7s of JIT/GC noise, larger than
  * most effects being tuned; min-of-`reps` with per-rep load capture
  * separates plan cost from host contention. Usage:
  * `runMain graft.PerfProbe <reps> <query...>` (default 3 reps over
  * the 10 headliner queries).
  */
object PerfProbe {

  /** The headline queries — the set BENCH mins are sanity-checked
    * against when a full run looks poisoned.
    */
  val Headliners = Seq(
    "q1_pricing", "q3_join_agg", "q5_region_revenue",
    "ts_trend_ma", "ts_forecast_baseline",
    "dedup_minhash_lsh", "dedup_pipeline",
    "ann_topk", "ann_ivf", "text_tfidf")

  def main(args: Array[String]): Unit = {
    // default CPUS matches graft.Bench's default, NOT the machine —
    // PROBE exists to cross-check BENCH mins, so it must measure the
    // same configuration (local[32] runs many-stage queries SLOWER on
    // sf0.1: 32 shuffle partitions × many stages = scheduling overhead
    // that reads as a phantom regression)
    val spark = Session.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq else Headliners
    def loadAvg(): Double = {
      val la = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      math.floor(la * 100.0 + 0.5) / 100.0
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // Same warm pass as Bench: run each probed query at the smallest
    // SF first so Janino's compile cache and the JIT are hot — without
    // it the first rep absorbs 2-4s of codegen, turning min-of-3 into
    // an effective min-of-2
    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      names.foreach { n =>
        // NonFatal only: a dying warm JVM (OOM, interrupt) must abort the
        // probe, not silently proceed to time a broken environment
        // (ADVICE r7)
        try SparkEntry.queries(n)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.sharedState.cacheManager.clearCache()
      }
    val results = names.map { n =>
      val samples = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        // min-of-N must measure the STANDALONE query each rep — the
        // train-once memo would make rep 2+ serve-only
        graft.operators.Similarity.clearTrainedMemo()
        val t0 = System.nanoTime()
        // noop-write sink, same as Bench: a count() lets Catalyst
        // prune unreferenced projections and top-level sorts, so
        // projection-only queries probe as row-count scans
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, loadAvg())
      }
      val times = samples.map(_._1).sorted
      println(f"PROBE $n%-24s min=${times.head}%6.2f med=${times(times.size / 2)}%6.2f reps=$reps")
      (n, times.head, samples)
    }
    val qs = results.map { case (n, min, _) => s"\"" + n + "\":" + min }
      .mkString("{", ",", "}")
    val samples = results.map { case (n, _, ss) =>
      s"\"" + n + "\":[" + ss.map(_._1).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val loads = results.map { case (n, _, ss) =>
      s"\"" + n + "\":[" + ss.map(_._2).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val nproc = Runtime.getRuntime.availableProcessors
    val json =
      s"""{"metric":"probe","reps":$reps,"unit":"sec","queries":$qs,"samples":$samples,"load":$loads,"nproc":$nproc,"sf":"$sfDir"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
