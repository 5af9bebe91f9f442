package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `ts` normalization contract of [[Tables.events]].
  *
  * The driver has shipped `events.parquet` under three encodings so far:
  * parquet TIMESTAMP(NANOS) (read as a raw long under `nanosAsLong`),
  * TIMESTAMP(µs, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ on
  * Spark ≥3.4), and plain adjusted TIMESTAMP. All three must come out
  * of `Tables.events` as a session-tz TimestampType carrying the same
  * microsecond instant, so every downstream `unix_micros(ts)` keeps
  * working no matter which generator wrote the file.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events normalizes TIMESTAMP_NTZ µs parquet to session-tz timestamp") {
    import spark.implicits._
    val us = Seq(0L, 1577836800000000L, 1577836800123456L) // epoch, 2020-01-01, +123456µs
    val dir = writeEvents(
      us.toDF("us").select(
        monotonically_increasing_id().as("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))

    // precondition: the raw read really is NTZ, else this test pins nothing
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType === TimestampNTZType)

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq === us.sorted)
  }

  test("events truncates ns-as-long parquet to the same µs instants as DuckDB") {
    import spark.implicits._
    val ns = Seq(0L, 1577836800000000999L, 999L) // sub-µs ns must truncate toward zero
    val dir = writeEvents(ns.toDF("ts").select(
      monotonically_increasing_id().as("event_id"), col("ts")))

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq === ns.map(_ / 1000L).sorted)
  }

  test("events passes adjusted TIMESTAMP parquet through unchanged") {
    import spark.implicits._
    val us = Seq(42L, 1577836800000000L)
    val dir = writeEvents(us.toDF("us").select(
      monotonically_increasing_id().as("event_id"),
      timestamp_micros(col("us")).as("ts")))

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(got.toSeq === us.sorted)
  }

  test("driver testdata events reads as timestamp and unix_micros works") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampType)
    val n = ev.select(unix_micros(col("ts"))).filter(col("unix_micros(ts)").isNotNull).count()
    assert(n > 0)
  }
}
