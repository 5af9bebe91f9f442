package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the batch operators. The same
  * logical aggregations run incrementally with watermarked state —
  * at 100 TB/day this is the ingest path, with the batch operators
  * as the backfill path (lambda-free: identical expressions).
  */
object StreamOps {

  private def r3(c: org.apache.spark.sql.Column) = floor(c * 1000.0 + 0.5001) / 1000.0

  /** Watermarked tumbling-window aggregate over an event stream:
    * (window, event_type) → count + value sum. Append mode emits each
    * window once the watermark passes — bounded state.
    */
  def windowAgg(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), r3(sum(col("value"))).as("v_sum"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("v_sum"))

  /** Batch-equivalent of [[windowAgg]] — the backfill/oracle twin. */
  def windowAggBatch(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), r3(sum(col("value"))).as("v_sum"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("v_sum"))

  /** Streaming sessionization with Spark's native `session_window`
    * (gap-merged state, watermark-bounded) — the incremental twin of
    * [[graft.operators.Relational.sessionize]]; both treat a gap
    * ≥ `gap` as a session boundary. Append mode emits a session once
    * the watermark passes its close.
    */
  def sessionWindows(events: DataFrame, watermark: String, gap: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), r3(sum(col("value"))).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  /** Streaming exact-dedup: first event per content key within the
    * watermark horizon (state pruned beyond it). The incremental twin
    * of [[graft.operators.Dedup.exact]] — at ingest this drops exact
    * repeats before they ever land in the lake.
    */
  def dedupStream(events: DataFrame, watermark: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Batch twin of [[dedupStream]] with canonical deterministic
    * semantics: the first event per content key = min event-time,
    * tie-broken by event_id. (`dropDuplicatesWithinWatermark` keeps
    * the first ARRIVAL, which coincides with this exactly when the
    * stream is event-time ordered — the batch twin pins down the
    * deterministic answer the oracle can check.) One shuffle on the
    * content key; per-key state is a single row.
    */
  def dedupStreamBatch(events: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("ts_us"), col("event_id"))
    events
      .select(keyCols.map(col) ++ Seq(col("event_id"), unix_micros(col("ts")).as("ts_us")): _*)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Streaming benchmark decontamination at INGEST: emit the doc_id of
    * every streaming document sharing a word n-gram with the (static,
    * broadcast) benchmark corpus — the eval-overlap flagging of
    * [[graft.operators.TextOps.decontaminate]] applied before data
    * ever lands in the lake. Stream-static inner join on the exploded
    * gram (the static side broadcast — stateless probe), then
    * watermarked `dropDuplicatesWithinWatermark` collapses a doc's
    * multiple gram hits to ONE emitted row; state = one key per
    * contaminated doc inside the horizon, pruned beyond it.
    */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame, n: Int,
                          watermark: String): DataFrame = {
    val bench = broadcast(
      benchmark.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(explode(graft.operators.TextOps.distinctNgrams("toks", n)).as("gram"))
        .distinct())
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.TextOps.distinctNgrams("toks", n)).as("gram"))
      .join(bench, "gram")
      .select(col("doc_id"), col("ts"))
      .dropDuplicatesWithinWatermark("doc_id")
  }

  /** Batch twin of [[decontaminateStream]] with canonical
    * deterministic semantics: one row per contaminated doc with its
    * FIRST event time (min ts — the row
    * `dropDuplicatesWithinWatermark` keeps when the stream arrives in
    * event-time order; the batch twin pins the deterministic answer
    * the oracle can check). Same shape as the streaming plan: gram
    * explode, broadcast benchmark probe, per-doc collapse — one
    * shuffle on doc_id carrying only (doc_id, ts) scalars.
    */
  def decontaminateStreamBatch(docs: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val bench = broadcast(
      benchmark.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(explode(graft.operators.TextOps.distinctNgrams("toks", n)).as("gram"))
        .distinct())
    docs
      .select(col("doc_id"), unix_micros(col("ts")).as("ts_us"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("ts_us"),
        explode(graft.operators.TextOps.distinctNgrams("toks", n)).as("gram"))
      .join(bench, "gram")
      .groupBy(col("doc_id"))
      .agg(min(col("ts_us")).as("ts_us"))
  }

  /** Batch twin of [[sessionWindows]]. */
  def sessionWindowsBatch(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), r3(sum(col("value"))).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
}
