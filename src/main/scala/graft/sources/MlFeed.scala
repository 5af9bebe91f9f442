package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Deterministic shard id for a key: md5-derived uniform bucket in
    * [0, nShards) — the same engine-portable hash-PRNG family as
    * [[graft.operators.Relational.sampleStratified]]. Spark's internal
    * `repartition(n, key)` hash (murmur3 of the unsafe row) is NOT
    * reproducible by any external engine, which is why the r7 batches
    * gate was single-shard-only; this assignment is one line of SQL in
    * DuckDB too, so multi-shard batch composition is oracle-checkable.
    */
  def shardOf(key: Column, nShards: Int): Column =
    conv(substring(md5(concat(lit("shard:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("bigint").mod(nShards).cast("int")

  /** A NULL key has no deterministic shard (`shardOf(null)` is null —
    * partitionBy would write it as the Hive default partition and the
    * batcher would NPE on it). Rejected with a per-row `raise_error`
    * folded into the shard expression — a named failure at zero extra
    * passes; silently dropping training samples would be worse.
    */
  private def shardOrFail(key: Column, nShards: Int): Column =
    when(key.isNull, raise_error(lit(
        "writeShards: NULL user_id has no deterministic shard; " +
          "filter or impute keys before sharding")).cast("int"))
      .otherwise(shardOf(key, nShards))

  /** Hash-sharded parquet write: `nShards` key-group files so a
    * training worker reads whole keys; no tiny-file explosion. The
    * shard id is the EXPLICIT [[shardOf]] column (engine-reproducible,
    * not Spark's internal hash partitioning) and the layout is
    * `partitionBy("shard")`: one directory per shard, exactly one file
    * per directory (each shard value is repartitioned into one task),
    * rows key-sorted within it — deterministic file contents across
    * reruns, better parquet encoding, and a batch composition
    * expressible as `rank(user_id) within shard div batchSize` (how
    * the external `ml_feed_batches*` oracles verify the roundtrip).
    */
  def writeShards(samples: DataFrame, path: String, nShards: Int): Unit =
    samples.withColumn("shard", shardOrFail(col("user_id"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("user_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

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

  /** Shard-aware batcher: batches never cross shard boundaries and are
    * numbered PER SHARD, so batch membership is exactly
    * `rank(user_id) within shard div batchSize` — deterministic and
    * engine-reproducible at any shard count (the multi-shard
    * `ml_feed_batches_sharded` gate), regardless of how the reader
    * packs files into partitions: Spark may coalesce several small
    * shard files into one read partition, but each file's rows stay
    * contiguous and key-sorted within it, and the batcher cuts on
    * shard change. Still mapPartitions — zero shuffle, zero driver
    * collect. Assumes one file per shard ≤ `maxPartitionBytes` (how
    * [[writeShards]] sizes them: a shard ≈ one training-worker
    * partition); a shard file large enough to be SPLIT across read
    * partitions would restart its batch numbering mid-shard — so the
    * assumption is CHECKED by default ([[validateShardLayout]], ADVICE
    * r8): duplicate (shard, batch) ids become a named error, not a
    * silently corrupted feed. `validate = false` skips the check when
    * the caller has already validated the layout (e.g. many epochs
    * over one write).
    */
  /** Read-side guard for [[batchesByShard]]'s one-contiguous-run-per-
    * shard assumption: fails with a named error if any shard's rows
    * span MULTIPLE read partitions (a shard file bigger than
    * `spark.sql.files.maxPartitionBytes` is split, restarting batch
    * numbering mid-shard). One column-pruned scan + a map-side-combined
    * countDistinct — and because FilePartition planning depends only on
    * file sizes (not on which columns are read), this probe sees
    * EXACTLY the partition layout the batcher's full-column read gets.
    * Several whole shards coalesced into one partition is fine (the
    * batcher cuts on shard change); one shard across several partitions
    * is not.
    */
  def validateShardLayout(spark: SparkSession, path: String): Unit = {
    val bad = spark.read.parquet(path)
      .select(col("shard").cast("int").as("shard"),
        spark_partition_id().as("pid"))
      .groupBy(col("shard")).agg(countDistinct(col("pid")).as("nparts"))
      .where(col("nparts") > 1)
      .limit(5).collect()
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"shard ${r.get(0)} spans ${r.get(1)} partitions").mkString("; ")
      throw new IllegalStateException(
        s"batchesByShard: shard file(s) split across read partitions ($detail) — " +
          "batch numbering would restart mid-shard. Raise " +
          "spark.sql.files.maxPartitionBytes above the largest shard file, " +
          "or re-shard with more shards (writeShards targets one " +
          "training-worker partition per shard)")
    }
  }

  def batchesByShard(spark: SparkSession, path: String, batchSize: Int,
                     validate: Boolean = true): DataFrame = {
    if (validate) validateShardLayout(spark, path)
    val df = spark.read.parquet(path)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("shard", IntegerType),
      StructField("batch", IntegerType),
      StructField("n", IntegerType),
      StructField("xs", ArrayType(ArrayType(FloatType))),
      StructField("ys", ArrayType(ArrayType(FloatType)))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("shard").cast("int").as("shard"), col("x"), col("y"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[Row] {
          // per-shard batch counter; a shard's rows are one contiguous
          // run within the partition, so the map stays O(#shards seen)
          private val nextBatch = scala.collection.mutable.Map.empty[Int, Int]
          def hasNext: Boolean = buf.hasNext
          def next(): Row = {
            val shard = buf.head.getInt(0)
            val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
            while (buf.hasNext && buf.head.getInt(0) == shard && rows.length < batchSize)
              rows += buf.next()
            val b = nextBatch.getOrElse(shard, 0)
            nextBatch(shard) = b + 1
            Row(shard, b, rows.length,
              rows.map(_.getSeq[Float](1)).toSeq,
              rows.map(_.getSeq[Float](2)).toSeq)
          }
        }
      }(enc)
  }
}
