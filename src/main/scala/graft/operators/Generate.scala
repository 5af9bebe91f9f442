package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic time-series generator — the Spark-native
  * re-expression of the reference's mock-series factory
  * (reference: src/demo/create_time_series.py:94-196: per-customer
  * series = seasonal wave + trend + noise + level-shift spikes).
  *
  * Differences by design, for 100-TB reproducibility:
  *   - randomness is a hash-PRNG (md5 of key/t/tag) instead of
  *     numpy's global RNG — values are identical no matter how the
  *     job is partitioned or re-run, and expressible in any engine;
  *   - all four reference signal types (sine/sawtooth/triangle/
  *     square, create_time_series.py:110-139) are generated; the sine
  *     is a folded-parabola approximation with a cubic refinement
  *     (max error ≈ 0.1% of amplitude) because transcendental libm
  *     results are not bit-portable across engines — the
  *     approximation uses only IEEE mul/add, evaluated in the same
  *     order on both sides, so it is;
  *   - rows are generated distributed: `spark.range(nKeys)` ×
  *     `explode(sequence(0, nDays-1))` — no driver-side loop, scales
  *     linearly with cluster size.
  */
object Generate {

  /** Uniform [0,1) from md5(key ":" tag), 5 decimal digits. */
  private def u(key: Column, tag: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(":" + tag))), 1, 8), 16, 10)
      .cast("bigint") % 100000L).cast("double") / 100000.0

  private def r3(c: Column): Column = floor(c * 1000.0 + 0.5001) / 1000.0

  /** Generate `nKeys` daily series of length `nDays` with period-`p`
    * seasonality. Output: (key, t, v, signal_type).
    */
  def series(spark: SparkSession, nKeys: Int, nDays: Int, p: Int): DataFrame = {
    val k = col("key")
    val t = col("t").cast("double")
    val salary = (lit(100.0) + (k % 50).cast("double") * 10.0)
    val phase = u(k, "phase")
    // tt = fractional position in the cycle, phase-shifted
    val tt = {
      val x = t / p.toDouble + phase
      x - floor(x)
    }
    val saw = tt * 2.0 - 1.0
    val sq = when(tt < 0.5, 1.0).otherwise(-1.0)
    // sin(2π·tt) ≈ folded parabola q = ±16·u·(0.5−u) refined by
    // 0.775·q + 0.225·q·|q| — pure IEEE mul/add, identical
    // parenthesization in OracleSql.generate, so bit-exact both sides
    val u0 = when(tt < 0.5, tt).otherwise(tt - 0.5)
    val q = when(tt < 0.5, lit(1.0)).otherwise(lit(-1.0)) * (u0 * (lit(0.5) - u0) * 16.0)
    val sine = q * 0.775 + q * abs(q) * 0.225
    val signalType = (k % 4).cast("int")
    // Reference-exact amplitude/sign conventions per signal type
    // (create_time_series.py:136-139): sine/square scale 0.5·salary,
    // sawtooth is NEGATED (−0.5·salary·saw), triangle is full-amplitude
    // |saw|·salary with a constant −1 offset (not salary-scaled).
    val seasonal = when(signalType === 0, sine * 0.5 * salary)
      .when(signalType === 1, saw * -0.5 * salary)
      .when(signalType === 2, abs(saw) * salary - 1.0)
      .otherwise(sq * 0.5 * salary)
    val trendSign = when(u(k, "sign") < 0.5, -1.0).otherwise(1.0)
    val trend = trendSign * (u(k, "trend") + 0.5) * (t / nDays.toDouble)
    val noise = (u(concat(k, lit("@"), col("t")), "noise") - 0.5) * 0.2
    val spikeDay = floor(u(k, "spikeday") * (nDays * 0.6))
    val spike = when(t >= spikeDay, (u(k, "spikeamp") - 0.5) * 6.0).otherwise(0.0)
    spark.range(nKeys).toDF("key")
      .select(k, explode(sequence(lit(0), lit(nDays - 1))).as("t"))
      .select(k, col("t"),
        r3(seasonal + salary * (trend + noise + spike)).as("v"),
        signalType.as("signal_type"))
  }
}
