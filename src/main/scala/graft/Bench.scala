package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Session.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-reader warmup so the first timed query
    // doesn't absorb ~5s of one-time initialization
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Warm every query's code path at the smallest SF first: the plans
    // differ from the timed ones only in the path literal, so the
    // generated code is identical — Janino's compile cache and the JIT
    // are hot before timing starts. Measured per-query first-run
    // overhead (codegen compile + interpreter warmup) is otherwise
    // 0.5-4s per query, larger than most queries' actual work.
    // Sink every benched query through a noop-format write: count()
    // lets Catalyst prune unreferenced projections and drop top-level
    // sorts, so projection-only queries (text ops, resize) were benched
    // as little more than a parquet row-count scan. The noop sink
    // evaluates every output column with zero driver collect.
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        // NonFatal only: a warm-pass OutOfMemoryError/InterruptedException
        // means the JVM is dying — timing a broken JVM produces numbers
        // that measure nothing; let it propagate (ADVICE r7)
        try sink(fn(spark, warmDir))
        catch { case scala.util.control.NonFatal(_) => () }
        // operators persist their fan-out intermediates (cache
        // contract) — clear per query or re-persists WARN
        spark.sharedState.cacheManager.clearCache()
      }
    spark.sharedState.cacheManager.clearCache()
    // Two samples per query, INTERLEAVED: pass 1 over every query,
    // then pass 2 — so one query's samples are minutes apart and a
    // transient load spike on the host machine can contaminate at most
    // one of them. (BENCH_r03 ran its two samples back-to-back: a
    // multi-second contention window on the driver machine poisoned
    // BOTH samples of ts_changepoint — 16.6s captured vs 0.58s
    // reproducible. min-of-2 only protects when the samples are
    // temporally independent.) Both samples are emitted alongside the
    // min so contamination is visible, not silently absorbed.
    val names = SparkEntry.queries.toSeq
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    // System 1-min load average captured at the END of each sample
    // (its EMA window covers the sample) — a sample whose load is well
    // above this JVM's own thread count was contended by OTHER
    // processes on the host, and its elapsed time measures the host,
    // not the plan. BENCH_r06 pass-1 carried up to 6× contamination
    // that was only diagnosable by cross-round forensics; with the
    // per-sample load field it reads directly off the artifact (see
    // SURVEY §6 for how to read it).
    def loadAvg(): Double = {
      val la = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      math.floor(la * 100.0 + 0.5) / 100.0
    }
    // Per-sample the trained-artifact memo hits are RECORDED, and the
    // memo is cleared at the pass boundary (VERDICT r13 measurement-
    // semantics note): within each pass the FIRST query of a trained
    // family is build-inclusive and later family members serve warm —
    // the same semantics in both passes, so min-of-2 compares like
    // with like — and the per-query memo flags below make the warm
    // queries identifiable in the artifact instead of silently
    // changing meaning across rounds.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             name: String): (Double, Double, Boolean) = {
      spark.sharedState.cacheManager.clearCache()
      val h0 = graft.operators.Similarity.memoHitCount
      val t0 = System.nanoTime()
      try {
        sink(fn(spark, sfDir))
        ((System.nanoTime() - t0) / 1e9, loadAvg(),
          graft.operators.Similarity.memoHitCount > h0)
      }
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"BENCH FAIL $name: $e")
        // failed samples report negative elapsed so they can't read
        // as a fast success
        (-1.0, loadAvg(), false)
      }
    }
    graft.operators.Similarity.clearTrainedMemo()
    val pass1 = names.map { case (name, fn) => name -> once(fn, name) }
    graft.operators.Similarity.clearTrainedMemo()
    val pass2 = names.map { case (name, fn) =>
      name -> (if (errors.contains(name)) (-1.0, loadAvg(), false) else once(fn, name))
    }
    val s2 = pass2.toMap
    val results = pass1.map { case (name, (a, _, _)) =>
      val b = s2(name)._1
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val samples = pass1.map { case (k, (a, _, _)) => s"\"" + k + "\":[" + a + "," + s2(k)._1 + "]" }
      .mkString("{", ",", "}")
    val loads = pass1.map { case (k, (_, l1, _)) => s"\"" + k + "\":[" + l1 + "," + s2(k)._2 + "]" }
      .mkString("{", ",", "}")
    // true ⇒ that sample served at least one memoized trained
    // artifact (its time measures warm serving, not build+serve)
    val memo = pass1.map { case (k, (_, _, m1)) => s"\"" + k + "\":[" + m1 + "," + s2(k)._3 + "]" }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // ok_total = the clean sum over succeeded queries (cross-round
    // tooling reads it directly); `value` keeps the error-poisoned
    // convention so a failing round can never read as fast
    val okTotal = results.collect { case (_, v) if v >= 0 => v }.sum
    val total = okTotal + errors.size * 1e6 // failures poison the total
    val nproc = Runtime.getRuntime.availableProcessors
    val json = s"""{"metric":"total","value":$total,"ok_total":$okTotal,"unit":"sec","queries":$qs,"samples":$samples,"load":$loads,"memo":$memo,"nproc":$nproc,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // Durable artifact (VERDICT r7 #1): the single stdout JSON line grew
    // past the driver's tail-capture window once per-sample load was
    // added, and BENCH_r07's per-query payload was lost ("parsed": null).
    // Mirror PerfProbe's SPARK_GRAFT_PROBE_OUT file-write, with an
    // in-repo default so the artifact survives even when the driver
    // doesn't set the env var.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"BENCH artifact write to $outPath failed: $e") }
    // Compact summary LAST (VERDICT r8 #6): the full line above has been
    // tail-truncated two rounds running ("parsed": null in BENCH_r07/r08).
    // This one is ~100 bytes — it fits ANY tail window, and it is valid
    // standalone JSON in the driver's contract shape, so a last-line (or
    // first-parsable-line) reader gets at least total/count/errors; the
    // per-query payload lives in the durable file either way.
    val summary = s"""{"metric":"total","value":$total,"ok_total":$okTotal,"unit":"sec","n":${names.size},""" +
      s""""errors":$errs,"sf":"$sfDir","detail":"$outPath"}"""
    println(summary)
    spark.stop()
  }
}
