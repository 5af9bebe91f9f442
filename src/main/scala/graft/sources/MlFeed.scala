package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data feed — the Spark-native replacement for the
  * reference's Petastorm converter (reference: training.py:244-251,
  * `make_spark_converter` + `make_tf_dataset`).
  *
  * Instead of a driver-side converter cache, the feed is:
  *   1. `samples`  — (key, x: array<float>, y: array<float>) built
  *      with one shuffle (groupBy key over the windowed daily series);
  *   2. `writeShards` — hash-sharded parquet sized so one shard ≈ one
  *      training-worker partition (at 100 TB: shards ≈ workers × k,
  *      written once, readable by any Arrow-based loader);
  *   3. `batches` — a mapPartitions batcher that yields fixed-size
  *      batch rows (the `make_tf_dataset(batch_size)` analogue)
  *      without ever collecting to the driver.
  */
object MlFeed {

  /** Per-key training samples from the daily series: x = the `nX`
    * days before the final `nY`, y = the final `nY` days.
    */
  def samples(daily: DataFrame, nX: Int, nY: Int): DataFrame = {
    val tagged = daily
      .withColumn("rn_end", row_number().over(
        Window.partitionBy("user_id").orderBy(col("day").desc)))
      .where(col("rn_end") <= nX + nY)
    tagged.groupBy(col("user_id"))
      .agg(
        // sort_array on struct(day, v) orders by day (first field) —
        // native expression, no interpreted comparator lambda
        expr("transform(sort_array(collect_list(struct(day, v))), s -> cast(s.v as float))").as("series"),
        count(when(col("rn_end") <= nY, 1)).as("y_n"),
        count(when(col("rn_end") > nY, 1)).as("x_n"))
      .select(col("user_id"),
        expr("slice(series, 1, cast(x_n as int))").as("x"),
        expr("slice(series, cast(x_n as int) + 1, cast(y_n as int))").as("y"))
  }

  /** Hash-sharded parquet write: `nShards` files keyed on user_id so a
    * training worker reads whole keys; no tiny-file explosion. Shards
    * are key-sorted (`sortWithinPartitions`): deterministic file
    * contents across reruns, better parquet encoding, and — with a
    * single shard — a batch composition expressible as
    * `rank(user_id) div batchSize` (which is how the external
    * `ml_feed_batches` oracle verifies the roundtrip).
    */
  def writeShards(samples: DataFrame, path: String, nShards: Int): Unit =
    samples.repartition(nShards, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(path)

  /** Fixed-size training batches, assembled per partition — zero
    * driver involvement. Each row: (batch_in_partition, n, xs, ys).
    */
  def batches(spark: SparkSession, path: String, batchSize: Int): DataFrame = {
    val df = spark.read.parquet(path)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("batch", IntegerType),
      StructField("n", IntegerType),
      StructField("xs", ArrayType(ArrayType(FloatType))),
      StructField("ys", ArrayType(ArrayType(FloatType)))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select("x", "y").mapPartitions { it =>
      it.grouped(batchSize).zipWithIndex.map { case (rows, i) =>
        Row(i, rows.length,
          rows.map(_.getSeq[Float](0)).toSeq,
          rows.map(_.getSeq[Float](1)).toSeq)
      }
    }(enc)
  }
}
