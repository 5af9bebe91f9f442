package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest/egress surface beyond parquet: schema-explicit CSV and JSON
  * readers (never schema inference on a 100 TB directory — one pass of
  * inference doubles the read), and the canonical partitioned-parquet
  * lake layout.
  *
  * The reference's I/O is parquet tables behind a notebook platform
  * (reference: src/demo/create_time_series.py:193-196 writes a daily
  * table); graft's lake layout partitions by day so per-day ingest is
  * append-only and date-ranged queries prune partitions at planning
  * time (visible as `PartitionFilters` in the scan).
  */
object Formats {

  /** Read CSV with a REQUIRED schema (header expected, no inference). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read JSON-lines with a REQUIRED schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Write the lake layout: parquet partitioned by a day column —
    * append-friendly, partition-pruned on date predicates.
    */
  def writeDayPartitioned(df: DataFrame, path: String, dayCol: String = "day"): Unit =
    df.withColumn(dayCol, col(dayCol).cast("string"))
      .write.mode("overwrite").partitionBy(dayCol).parquet(path)

  def readDayPartitioned(spark: SparkSession, path: String, dayCol: String = "day"): DataFrame =
    spark.read.parquet(path).withColumn(dayCol, col(dayCol).cast("date"))

  /** Write a catalog table bucketed (and sorted) by a key: the
    * co-located-join layout of SURVEY §3/§5 — two tables bucketed the
    * same way join WITHOUT any Exchange (each bucket pairs by file),
    * which at 100 TB is the difference between a join and a
    * cluster-wide reshuffle of both inputs. Bucketing requires the
    * catalog (`saveAsTable`), not a bare path — bucket metadata lives
    * in the metastore. FormatsSpec proves the exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    writeBucketedKeys(df, table, Seq(key), nBuckets)

  /** Multi-key variant: bucket (and sort) by a composite key — the
    * layout for joins whose equi-keys are composite, e.g. the LSH band
    * index's (band, sig). Join keys must match the bucket columns
    * exactly for the exchange-free scan. `mode = "append"` adds rows
    * to an existing table (Spark validates the bucket spec matches) —
    * new rows land in the right buckets by construction, so the
    * exchange-free join property survives incremental growth.
    */
  def writeBucketedKeys(df: DataFrame, table: String, keys: Seq[String],
                        nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Bucket by one key set, sort files by a LONGER prefix-compatible
    * column list — the window-function layout: a table bucketed by
    * `key` and sorted by `(key, time)` serves `PARTITION BY key ORDER
    * BY time` windows with the scan's own partitioning (zero
    * Exchange; the bucketed scan reports HashPartitioning(key), which
    * satisfies the window's ClusteredDistribution). The input is
    * repartitioned onto the bucket key first so each task holds
    * exactly its bucket's rows — one file per bucket, the layout
    * Spark needs to also report the sort order.
    */
  def writeBucketedSorted(df: DataFrame, table: String, bucketKeys: Seq[String],
                          sortCols: Seq[String], nBuckets: Int,
                          mode: String = "overwrite"): Unit =
    df.repartition(nBuckets, bucketKeys.map(col): _*)
      .write.mode(mode)
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet").saveAsTable(table)
}
