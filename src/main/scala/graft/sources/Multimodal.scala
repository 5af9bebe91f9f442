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
    * SPLIT-MERGE running sum (the `ts_sessionize_splitmerge`
    * discipline) — a bare per-modality window would have exactly
    * |modalities| ≈ 3 partitions at ANY corpus size, one reducer per
    * modality as the 100-TB wall clock. Instead:
    *
    *   1. items bucket by the first `prefixLen` hex chars of the md5
    *      stream key — fixed-length-prefix order agrees with full-key
    *      order, so bucket b's items ALL precede bucket b+1's in the
    *      stream (the two-level-prefix identity: global exclusive
    *      sum = whole-buckets-before offset + within-bucket exclusive
    *      sum);
    *   2. per-(modality, bucket) byte sums — one map-side-combined
    *      aggregate, ≤ |modalities|·16^prefixLen rows;
    *   3. exclusive bucket offsets via a window over that TINY frame,
    *      kept only while offset < budget — buckets whose offset
    *      already exceeds the budget can never keep a row
    *      (stream_pos ≥ offset; byte lengths are non-negative), so
    *      the pruning join also shrinks the expensive stage to the
    *      few buckets that straddle the budget;
    *   4. broadcast the offsets back and run the within-bucket
    *      running sum partitioned on (modality, bucket) — a hot
    *      modality now spreads over 16^prefixLen parallel partitions
    *      instead of one.
    *
    * Result-identical to the sequential fill (spec-pinned against
    * [[budgetSampleSeq]] including over/under-budget boundary items);
    * the gate shares the sequential oracle unchanged.
    */
  def budgetSample(media: DataFrame, byteBudget: Long,
                   seed: String = "mbudget", prefixLen: Int = 2): DataFrame =
    budgetSampleFlat(media.select(col("media_id"),
      col("meta.modality").as("modality"),
      col("meta.n_bytes").as("n_bytes")), byteBudget, seed, prefixLen)

  /** [[budgetSample]]'s split-merge body over the FLAT
    * (media_id, modality, n_bytes) projection — shared with the
    * stored-index serve path ([[mediaBudgetAgainstIndex]]), whose
    * rows carry no meta struct.
    */
  private def budgetSampleFlat(flat: DataFrame, byteBudget: Long,
                               seed: String, prefixLen: Int): DataFrame = {
    require(byteBudget > 0,
      s"budgetSample: byteBudget must be positive, got $byteBudget " +
        "(the first-item-per-modality guarantee assumes a positive budget)")
    require(prefixLen >= 1 && prefixLen <= 8,
      s"budgetSample: prefixLen must be in [1, 8], got $prefixLen")
    import org.apache.spark.sql.expressions.Window
    val base = flat.select(col("media_id"), col("modality"), col("n_bytes"),
        md5(concat(lit(s"$seed:"), col("media_id").cast("string"))).as("shuf"))
      .withColumn("bkt", substring(col("shuf"), 1, prefixLen))
    val wk = Window.partitionBy(col("modality")).orderBy(col("bkt"))
    val offsets = base.groupBy(col("modality"), col("bkt"))
      .agg(sum(col("n_bytes")).as("bsum"))
      .withColumn("bkt_off", coalesce(sum(col("bsum")).over(
        wk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("bkt_off") < byteBudget)
      .select(col("modality"), col("bkt"), col("bkt_off"))
    base.join(broadcast(offsets), Seq("modality", "bkt"))
      .withColumn("stream_pos", col("bkt_off") + coalesce(sum(col("n_bytes")).over(
        Window.partitionBy(col("modality"), col("bkt"))
          .orderBy(col("shuf"), col("media_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .where(col("stream_pos") < byteBudget)
      .select(col("media_id"), col("modality"), col("n_bytes"), col("stream_pos"))
  }

  /** The single-window sequential fill — the SPEC REFERENCE for
    * [[budgetSample]]'s split-merge identity claim (one events-sized
    * window per modality key: correct, and the hot-modality
    * single-reducer shape the split-merge retires).
    */
  private[graft] def budgetSampleSeq(media: DataFrame, byteBudget: Long,
                                     seed: String = "mbudget"): DataFrame = {
    require(byteBudget > 0,
      s"budgetSampleSeq: byteBudget must be positive, got $byteBudget")
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

  // -----------------------------------------------------------------
  // Stored MEDIA INDEX — the multimodal family's lifecycle story
  // (VERDICT r16 #6): the content-digest metadata index every media
  // lake keeps beside its blob store. Rows are (media_id, digest,
  // modality, n_bytes) — digests only, blobs never move — bucketed by
  // digest so dedup verdicts (a digest-partitioned window) serve
  // zero-Exchange off the scan. Append / tombstone-takedown (licensed
  // media) / compact, masked serving for dedup AND budget verdicts —
  // lifecycle parity with the band/gram/graph/ANN/BM25 families.
  // -----------------------------------------------------------------

  /** Persist the media index from an ingest frame. The digest is
    * computed in the scan projection (payload bytes never shuffle);
    * `_mmeta` pins the bucket count for appends; the previous
    * generation's tombstones drop (the stale-tombstone rebuild rule).
    */
  def writeMediaIndex(media: DataFrame, table: String, nBuckets: Int): Unit = {
    val spark = media.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${table}_mtombstones")
    // the two tables are independent — overlap the writes (Par)
    import spark.implicits._
    graft.operators.Par.inParallel(
      () => graft.sources.Formats.writeBucketedKeys(
        media.select(col("media_id"), md5(col("payload")).as("digest"),
          col("meta.modality").as("modality"),
          col("meta.n_bytes").as("n_bytes")),
        s"${table}_media", Seq("digest"), nBuckets),
      () => Seq(nBuckets).toDF("n_buckets")
        .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_mmeta"))
  }

  /** Append NEW media to a stored index — the nightly crawl delta.
    * The `_media` table is its own membership ledger: re-ingesting an
    * id would double its digest group's `n_copies` and let a later
    * takedown leave a phantom copy, so overlapping ids are a directed
    * error (the `_sdocs` discipline).
    */
  def appendMediaIndex(media: DataFrame, table: String): Unit = {
    val spark = media.sparkSession
    require(spark.catalog.tableExists(s"${table}_mmeta"),
      s"media index '$table' has no ${table}_mmeta table — build it with writeMediaIndex")
    val nBuckets = spark.table(s"${table}_mmeta").head().getAs[Int]("n_buckets")
    val overlap = media.select(col("media_id"))
      .join(spark.table(s"${table}_media").select(col("media_id")), Seq("media_id"),
        "left_semi")
      .limit(5).collect().map(_.getLong(0))
    require(overlap.isEmpty,
      s"appendMediaIndex: media ids already indexed in '$table' " +
        s"(e.g. ${overlap.mkString(", ")}) — re-appending double-counts " +
        "copy groups; append only NEW media (or rebuild the index)")
    graft.sources.Formats.writeBucketedKeys(
      media.select(col("media_id"), md5(col("payload")).as("digest"),
        col("meta.modality").as("modality"),
        col("meta.n_bytes").as("n_bytes")),
      s"${table}_media", Seq("digest"), nBuckets, mode = "append")
  }

  /** Tombstone takedown — licensed/withdrawn media: the ids land in
    * `<table>_mtombstones` (append-mode) and every serve path masks
    * them immediately; [[compactMediaIndex]] folds them.
    */
  def deleteFromMediaIndex(ids: DataFrame, table: String): Unit = {
    val spark = ids.sparkSession
    require(spark.catalog.tableExists(s"${table}_mmeta"),
      s"media index '$table' has no ${table}_mmeta table — build it with writeMediaIndex")
    ids.select(col("media_id")).distinct()
      .write.mode("append").format("parquet")
      .saveAsTable(s"${table}_mtombstones")
  }

  /** The index scan with the tombstone mask applied — the only way
    * serve paths read `<table>_media`. Tombstones are
    * takedown-cadence-bounded → broadcast anti-join; the bucketed
    * scan's digest partitioning survives the mask.
    */
  private def maskedMediaIndex(spark: org.apache.spark.sql.SparkSession,
                               table: String): DataFrame = {
    require(spark.catalog.tableExists(s"${table}_media"),
      s"media index '$table' has no ${table}_media table — build it with writeMediaIndex")
    val rows = spark.table(s"${table}_media")
    val tsT = s"${table}_mtombstones"
    if (!spark.catalog.tableExists(tsT)) rows
    else rows.join(
      // no distinct: anti-join is multiplicity-safe, and a distinct
      // here would put a tombstone-volume exchange in front of the
      // broadcast (the census spec pins ZERO exchanges on this path)
      broadcast(spark.table(tsT).select(col("media_id"))),
      Seq("media_id"), "left_anti")
  }

  /** Fold accumulated tombstones into the index: survivors rewrite via
    * write-then-swap (never overwrite-in-place — a failed overwrite
    * would torch the store), tombstones drop. Result ≡ the one-shot
    * build over the survivors (digest rows are independent — nothing
    * trained, nothing pinned).
    */
  def compactMediaIndex(table: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    require(spark.catalog.tableExists(s"${table}_mmeta"),
      s"media index '$table' has no ${table}_mmeta table — build it with writeMediaIndex")
    val tsT = s"${table}_mtombstones"
    if (!spark.catalog.tableExists(tsT)) return
    val nBuckets = spark.table(s"${table}_mmeta").head().getAs[Int]("n_buckets")
    val survivors = maskedMediaIndex(spark, table).localCheckpoint()
    graft.sources.Formats.writeBucketedKeys(
      survivors, s"${table}_media_compacting", Seq("digest"), nBuckets)
    spark.sql(s"DROP TABLE ${table}_media")
    spark.sql(s"ALTER TABLE ${table}_media_compacting RENAME TO ${table}_media")
    spark.sql(s"DROP TABLE $tsT")
  }

  /** [[dedupPayload]]'s verdicts served from the STORED index: per
    * surviving digest group, copy count and keep-min — a taken-down
    * copy neither counts nor keeps the moment its tombstone lands
    * (the group re-verdicts among survivors: if the kept copy was
    * taken down, the next-smallest id takes over). Zero-Exchange:
    * both windows partition on the digest the table is bucketed by.
    */
  def mediaDedupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                             table: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))
    maskedMediaIndex(spark, table)
      .select(col("media_id"), col("digest"), col("modality"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("keep",
        (col("media_id") === min(col("media_id")).over(w)).cast("int"))
  }

  /** [[budgetSample]] served from the STORED index: the split-merge
    * byte-budget fill over surviving rows — a takedown immediately
    * frees its bytes for later items in the md5 stream order (the
    * sampled corpus re-fills to budget among survivors).
    */
  def mediaBudgetAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                              table: String, byteBudget: Long,
                              seed: String = "mbudget",
                              prefixLen: Int = 2): DataFrame =
    budgetSampleFlat(maskedMediaIndex(spark, table)
      .select(col("media_id"), col("modality"), col("n_bytes")),
      byteBudget, seed, prefixLen)

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
