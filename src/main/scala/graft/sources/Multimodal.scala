package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payload + typed
  * metadata, with a partition-batched feature extractor.
  *
  * The decode step is a STUB by design — image/audio codecs are not
  * in this environment — but everything Spark-side is real: schema,
  * binary column handling, mapPartitions batching (the shape a
  * Pandas-UDF / Arrow decoder plugs into), and deterministic output
  * that an engine-independent oracle can verify.
  */
object Multimodal {

  /** Wrap documents as a media table: payload = utf-8 bytes of the
    * text (stand-in for an image blob), metadata struct typed the way
    * a real pipeline would carry (modality, byte length, fake dims).
    */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("modality"),
        length(col("text")).cast("long").as("n_bytes"),
        (col("doc_id") % 64 + 32).cast("int").as("width"),
        (col("doc_id") % 48 + 24).cast("int").as("height")).as("meta"))

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bucket", IntegerType),
    StructField("cnt", LongType)))

  /** Frame sampling for (fake) video payloads: every `stride`-th byte
    * offset is a "frame", emitted with its byte value — the offset
    * arithmetic, explode shape and schema are exactly what a real
    * video pipeline samples; only the per-frame decode is the stub.
    * Native sequence explode, no UDF.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
        decode(col("payload"), "UTF-8").as("txt"),
        col("meta.n_bytes").as("n"))
      .select(col("media_id"), col("txt"),
        explode(expr(s"sequence(0, cast(n - 1 as int), $stride)")).as("off"))
      .select(col("media_id"), col("off").cast("long").as("frame_off"),
        expr("cast(ascii(substr(txt, off + 1, 1)) as bigint)").as("frame_val"))

  /** Exact payload dedup on the BINARY column: md5 the blob bytes,
    * keep the smallest media_id of each content group — image/audio
    * dedup by content digest, the first dedup pass every multimodal
    * corpus runs (identical bytes re-crawled under different ids).
    * Same keep-min shape as text dedup_exact; the digest is computed
    * in the scan projection so blobs never shuffle — only (id, hash,
    * modality) rows do.
    */
  def dedupPayload(media: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
    media.select(col("media_id"), md5(col("payload")).as("content_hash"),
        col("meta.modality").as("modality"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("keep",
        (col("media_id") === min(col("media_id")).over(w)).cast("int"))
  }

  /** Resize metadata: target dimensions bounded to `maxDim` with
    * aspect ratio preserved — the planning half of a resize (the pixel
    * resample itself is the stubbed decode). Pure arithmetic on the
    * typed metadata, no payload access at all: at 100 TB this runs as
    * a column-pruned scan that never touches the blobs.
    */
  def resizeDims(media: DataFrame, maxDim: Int): DataFrame =
    media.select(col("media_id"),
        col("meta.width").cast("long").as("w"),
        col("meta.height").cast("long").as("h"))
      .withColumn("m", greatest(col("w"), col("h")))
      .select(col("media_id"), col("w"), col("h"),
        when(col("m") <= maxDim, col("w"))
          .otherwise(floor(col("w") * maxDim / col("m")).cast("long")).as("out_w"),
        when(col("m") <= maxDim, col("h"))
          .otherwise(floor(col("h") * maxDim / col("m")).cast("long")).as("out_h"))

  /** Next-fit byte-budget BIN PACKING of whole payloads — the
    * multimodal counterpart of token-stream packing: a blob cannot
    * split across training files, so instead of stream division each
    * blob lands wholly in the current bin, opening a new bin when it
    * would not fit (an oversize blob gets a bin of its own). Walk
    * order is media_id within each shard.
    *
    * Scale plan: packing is inherently sequential WITHIN a shard (bin
    * state depends on every prior blob) — exactly like every
    * production packer, the parallelism axis is shards: each shard's
    * fold runs independently after one shuffle on `shard`. The fold
    * is a higher-order `aggregate` over the (id, bytes) list; per-bin
    * audit rows come from one more map-side-combined groupBy. Emits
    * (shard, bin, n_blobs, bytes_used, fill = bytes/budget).
    */
  def packPayloads(docs: DataFrame, budget: Long): DataFrame = {
    val acc0 = "named_struct('bins', cast(array() as array<bigint>), " +
      "'bin', cast(0 as bigint), 'used', cast(0 as bigint))"
    val step = s"""(acc, x) -> CASE
      WHEN acc.used + x.n <= $budget THEN named_struct(
        'bins', concat(acc.bins, array(acc.bin)),
        'bin', acc.bin, 'used', acc.used + x.n)
      ELSE named_struct(
        'bins', concat(acc.bins, array(acc.bin + cast(1 as bigint))),
        'bin', acc.bin + cast(1 as bigint), 'used', x.n) END"""
    docs
      .select(col("doc_id").as("media_id"), col("source").as("shard"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n"))
      .groupBy(col("shard"))
      .agg(expr("sort_array(collect_list(struct(media_id, n)))").as("items"))
      .select(col("shard"),
        col("items"),
        expr(s"aggregate(items, $acc0, $step).bins").as("bins"))
      .select(col("shard"), explode(expr(
        "zip_with(items, bins, (it, b) -> named_struct('n', it.n, 'bin', b))"))
        .as("z"))
      .groupBy(col("shard"), col("z.bin").as("bin"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("z.n")).as("bytes_used"))
      .select(col("shard"), col("bin"), col("n_blobs"), col("bytes_used"),
        (floor(col("bytes_used") / lit(budget.toDouble) * 1000.0 + 0.5001) / 1000.0)
          .as("fill"))
  }

  private def r3(c: org.apache.spark.sql.Column) =
    floor(c * 1000.0 + 0.5001) / 1000.0

  /** [[ingest]] with a deterministic MODALITY MIX (doc_id % 3 →
    * image/audio/video) and per-modality metadata: duration_ms for
    * time media (a fixed fake ms-per-byte rate — the decode stub
    * convention), dims for images. The corpus a mixture owner
    * actually curates is multi-modality; the single-modality
    * [[ingest]] stays for the feature/pack gates built on it.
    */
  def ingestMixed(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        length(col("text")).cast("long").as("n_bytes"),
        when(pmod(col("doc_id"), lit(3)) =!= 0,
          (length(col("text")) * 40).cast("long")).as("duration_ms"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          (col("doc_id") % 64 + 32).cast("int")).as("width"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          (col("doc_id") % 48 + 24).cast("int")).as("height")).as("meta"))

  /** Corpus COMPOSITION report — the first dashboard of any
    * multimodal training corpus: per modality, item count, total and
    * mean payload bytes, max payload, total media duration. A mixture
    * owner reads this before setting per-modality budgets (bytes are
    * the storage cost; duration is the compute cost for time media).
    *
    * Scale shape: one map-side-combined groupBy over (modality,
    * n_bytes, duration) projections of the scan — payload bytes never
    * move, the result is |modalities|-sized.
    */
  def modalityStats(media: DataFrame): DataFrame =
    media.select(col("meta.modality").as("modality"),
        col("meta.n_bytes").as("nb"), col("meta.duration_ms").as("dur"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("nb")).as("total_bytes"),
        r3(avg(col("nb"))).as("avg_bytes"),
        max(col("nb")).as("max_bytes"),
        coalesce(sum(col("dur")), lit(0L)).as("total_duration_ms"))

  /** BYTE-BUDGET sampling per modality — `sample_token_budget`'s
    * discipline (seeded md5 stream order, exclusive running sum,
    * first-item-per-modality guarantee) with payload BYTES as the
    * cost model: each modality independently keeps items while the
    * bytes already taken stay under `byteBudget`, so the sampled
    * corpus lands on the per-modality storage budget a multimodal
    * mixture run provisions. Deterministic and engine-portable (the
    * md5 order, never rand()).
    *
    * Scale shape: ONE shuffle on the modality key feeding the running
    * sum window; only (id, modality, bytes) rows move — payloads stay
    * in place and the kept ids join back to them at read time.
    */
  def budgetSample(media: DataFrame, byteBudget: Long,
                   seed: String = "mbudget"): DataFrame = {
    require(byteBudget > 0,
      s"budgetSample: byteBudget must be positive, got $byteBudget " +
        "(the first-item-per-modality guarantee assumes a positive budget)")
    import org.apache.spark.sql.expressions.Window
    media.select(col("media_id"),
        col("meta.modality").as("modality"),
        col("meta.n_bytes").as("n_bytes"),
        md5(concat(lit(s"$seed:"), col("media_id").cast("string"))).as("shuf"))
      .withColumn("stream_pos", coalesce(sum(col("n_bytes")).over(
        Window.partitionBy(col("modality"))
          .orderBy(col("shuf"), col("media_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("stream_pos") < byteBudget)
      .select(col("media_id"), col("modality"), col("n_bytes"), col("stream_pos"))
  }

  /** "Decode + featurize" per partition: a deterministic byte-bucket
    * histogram (16 buckets) standing in for pixel statistics. A real
    * codec replaces the inner loop only — the iterator/batch shape,
    * schema and partitioning stay exactly as tested. Emits long
    * format (media_id, bucket, cnt), non-zero buckets only.
    */
  def features(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Long](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0x7f) % 16) += 1; i += 1 }
        (0 until 16).filter(hist(_) > 0).map(b => Row(id, b, hist(b)))
      }
    }(enc)
  }
}
