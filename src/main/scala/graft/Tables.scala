package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

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

  /** Events table. The driver writes `ts` as parquet TIMESTAMP(NANOS),
    * which Spark only reads via `spark.sql.legacy.parquet.nanosAsLong`
    * (set in [[Session]]) as a raw nanosecond long. Normalize to a
    * microsecond TIMESTAMP with integer division — the same ns→µs
    * truncation DuckDB applies, so both engines see identical instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
