package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet files `<dir>/<name>.parquet`. Reads go
  * through `spark.read.parquet` so Catalyst gets full pushdown /
  * pruning; at cluster scale the same code reads a partitioned
  * directory tree unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events table, with `ts` normalized to a session-tz TIMESTAMP no
    * matter which parquet encoding the driver generated:
    *
    *  - TIMESTAMP(NANOS): Spark only reads it (via
    *    `spark.sql.legacy.parquet.nanosAsLong`, set in [[Session]]) as a
    *    raw nanosecond long → truncate ns→µs exactly like DuckDB does.
    *  - TIMESTAMP(µs, isAdjustedToUTC=false): Spark ≥3.4 reads it as
    *    TIMESTAMP_NTZ → cast to TIMESTAMP. The session timezone is UTC
    *    ([[Session]]), so the cast keeps the stored µs value bit-exact,
    *    which is also how DuckDB treats a tz-less timestamp.
    *  - TIMESTAMP(µs/ms, adjusted): already TimestampType; no-op.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
