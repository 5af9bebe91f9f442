package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Generate, TimeSeries}

/** Reference-law fidelity of the synthetic generator
  * (create_time_series.py:94-196): exponential trend, 3-spike
  * injection with the N(3·salary, salary) amplitude law, and the
  * downstream detectors (changepoint / anomaly z-score) re-verified
  * against the multi-spike signal.
  */
class GenerateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  // --- driver-side replica of the generator's hash-PRNG -------------
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u(key: String, tag: String): Double =
    (java.lang.Long.parseLong(md5hex(key + ":" + tag).substring(0, 8), 16) % 100000L) / 100000.0

  /** Reference-formula recomputation (libm exp; approx sine — the
    * sine approximation itself is pinned by RelationalSpec's
    * fast-sine spec). Returns the UNROUNDED value.
    */
  private def expected(key: Long, t: Int, nKeys: Int, nDays: Int, p: Int): Double = {
    val k = key.toString
    val salary = 100.0 + (key % 50).toDouble * 10.0
    val (firstSpike, lastSpike, nSpikes) = Generate.spikeWindow(nDays)
    val x = t.toDouble / p + u(k, "phase")
    val tt = x - math.floor(x)
    val u0 = if (tt < 0.5) tt else tt - 0.5
    val q = (if (tt < 0.5) 1.0 else -1.0) * (u0 * (0.5 - u0) * 16.0)
    val sine = q * 0.775 + q * math.abs(q) * 0.225
    val saw = tt * 2.0 - 1.0
    val seasonal = (key % 4) match {
      case 0 => sine * 0.5 * salary
      case 1 => saw * -0.5 * salary
      case 2 => math.abs(saw) * salary - 1.0
      case _ => (if (tt < 0.5) 1.0 else -1.0) * 0.5 * salary
    }
    val tsign = if (u(k, "sign") < 0.5) -1.0 else 1.0
    val ta = u(k, "trend") + 1.0
    val trend = tsign * math.exp(ta * (t.toDouble / math.max(nDays - 1, 1)))
    val noise = (u(s"$key@$t", "noise") - 0.5) * 0.2
    val spike = (1 to nSpikes).map { j =>
      val st = firstSpike + math.floor(u(k, s"spikeday$j") * (lastSpike - firstSpike))
      val ss = if (u(k, s"spikesign$j") < 0.5) -1.0 else 1.0
      val sa = 3.0 + ((1 to 12).map(i => u(k, s"spikez${j}_$i")).sum - 6.0)
      if (t >= st) ss * sa else 0.0
    }.sum
    seasonal + salary * (trend + noise + spike)
  }

  private def spikeDays(key: Long, nDays: Int): Seq[Int] = {
    val (firstSpike, lastSpike, nSpikes) = Generate.spikeWindow(nDays)
    (1 to nSpikes).map(j =>
      firstSpike + math.floor(u(key.toString, s"spikeday$j") * (lastSpike - firstSpike)).toInt)
  }

  test("generated series matches the reference law (exp trend + 3 spikes) recomputed driver-side") {
    val (nKeys, nDays, p) = (20, 200, 30)
    val got = Generate.series(spark, nKeys, nDays, p).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size === nKeys * nDays)
    // tolerance: exp Taylor core rel. error ≈ 4e-6 on x∈[0,2] ×
    // |salary·e^x| ≤ 4400, + 5e-4 output rounding → 0.05 absolute;
    // a linear-ramp trend would be off by O(100)
    got.foreach { case ((key, t), v) =>
      val e = expected(key, t, nKeys, nDays, p)
      assert(math.abs(v - e) <= 0.05, s"key=$key t=$t got=$v expected=$e")
    }
  }

  test("trend component extracted from generated data is exponential, not a linear ramp") {
    // subtract the known seasonal/noise/spike parts from generated v;
    // what remains is salary·tsign·e^{ta·t̃} — its end/start ratio must
    // be e^{ta} (∈ [e, e²] for ta ~ U(1,2)), which no linear ramp has
    val (nKeys, nDays, p) = (8, 200, 30)
    val got = Generate.series(spark, nKeys, nDays, p).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (0L until nKeys.toLong).foreach { key =>
      def trendPart(t: Int): Double = {
        val full = expected(key, t, nKeys, nDays, p)
        val k = key.toString
        val salary = 100.0 + (key % 50).toDouble * 10.0
        val tsign = if (u(k, "sign") < 0.5) -1.0 else 1.0
        val ta = u(k, "trend") + 1.0
        val exp = salary * tsign * math.exp(ta * (t.toDouble / (nDays - 1)))
        // generated v minus everything except the trend
        got((key, t)) - (full - exp)
      }
      val ta = u(key.toString, "trend") + 1.0
      val ratio = trendPart(nDays - 1) / trendPart(0)
      assert(math.abs(ratio - math.exp(ta)) <= 0.01 * math.exp(ta),
        s"key=$key trend end/start ratio $ratio != e^ta ${math.exp(ta)}")
    }
  }

  test("spikes fall inside the reference window [nDays-457, nDays-92) and vanish for short series") {
    val nDays = 200
    (0L until 10L).foreach { key =>
      val days = spikeDays(key, nDays)
      assert(days.size === 3)
      days.foreach(d => assert(d >= 0 && d < nDays - 92))
    }
    assert(spikeDays(3L, 92).isEmpty) // no room: nDays ≤ 92
  }

  test("changepoint detects an injected spike day on the multi-spike signal") {
    val (nKeys, nDays, p) = (40, 200, 30)
    val daily = Generate.series(spark, nKeys, nDays, p)
      .select(col("key").as("user_id"),
        date_add(to_date(lit("2020-01-01")), col("t")).as("day"), col("v"))
    val cp = TimeSeries.changepoint(daily).collect()
      .map(r => r.getLong(0) ->
        (r.getDate(1).toLocalDate.toEpochDay - java.time.LocalDate.parse("2020-01-01").toEpochDay))
      .toMap
    val hits = (0L until nKeys.toLong).count { key =>
      cp.get(key).exists(t => spikeDays(key, nDays).contains(t.toInt))
    }
    // spike steps are ~|3+z|·salary vs seasonal day-over-day steps
    // ≤ ~salary (square flip / sawtooth wrap); an occasional small
    // |3+z| draw can lose to the seasonal step, so require a strong
    // majority, not unanimity (deterministic data → deterministic count)
    assert(hits >= (nKeys * 3) / 4, s"only $hits/$nKeys changepoints landed on injected spike days")
  }

  test("anomaly z-score flags days at or after a spike for most keys") {
    val (nKeys, nDays, p) = (40, 200, 30)
    val daily = Generate.series(spark, nKeys, nDays, p)
      .select(col("key").as("user_id"),
        date_add(to_date(lit("2020-01-01")), col("t")).as("day"), col("v"))
    val flagged = TimeSeries.scale(TimeSeries.detrend(TimeSeries.trend(daily, 15)))
      .where(abs(col("scaled")) >= 2.0)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    // a 3·salary level shift against a 0.5·salary seasonal must push
    // |z| past 2 somewhere for a strong majority of keys
    assert(flagged.size >= (nKeys * 3) / 4,
      s"only ${flagged.size}/$nKeys keys have |z|≥2 anomaly days on the multi-spike signal")
  }
}
