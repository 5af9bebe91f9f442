package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus preparation pipeline, composed from
  * the individually-gated stages:
  *
  *   quality filter → benchmark decontamination → near-dup removal →
  *   sequence packing
  *
  * i.e. the full path from a raw document table to packed training
  * sequences — what a user of this library actually runs before
  * handing data to a trainer (reference analogue: the cleaning →
  * feed chain around training.py:244, generalized to a document
  * corpus).
  *
  * Scale shape is the sum of its verified parts: the filter and the
  * decontamination probe are map-side over the scan (the benchmark
  * n-gram set broadcasts), near-dup is the banded-LSH pipeline (never
  * all-pairs), packing is one shuffle on the shard key. The stage
  * joins are all on bare doc_id keep-lists — no stage re-shuffles
  * document bodies except the final pack's (doc_id, shard, n_tokens)
  * projection.
  *
  * Composition note: dedup runs ON THE CLEAN SUBSET. Because MinHash
  * signatures and LSH band buckets are per-document (corpus-
  * independent), this equals computing candidates on the full corpus
  * and keeping pairs with both endpoints clean — the property the
  * external oracle exploits.
  */
object Corpus {

  def pipeline(docs: DataFrame, benchmark: DataFrame,
               decontaminateN: Int = 4,
               perms: Int = 16, rowsPerBand: Int = 2, minJaccard: Double = 0.5,
               budget: Int = 512, shardCol: String = "source"): DataFrame = {
    val keptFilter = TextOps.compositeFilter(docs)
      .where(col("keep") === 1).select(col("doc_id"))
    val keptDecon = TextOps.decontaminate(docs, benchmark, decontaminateN)
      .where(col("contaminated") === 0).select(col("doc_id"))
    val clean = docs.join(keptFilter, "doc_id").join(keptDecon, "doc_id")
    val survivors = Dedup.pipeline(clean, perms, rowsPerBand, minJaccard)
      .where(col("keep") === 1).select(col("doc_id"))
    TextOps.packSequences(docs.join(survivors, "doc_id"), budget, shardCol)
  }
}
