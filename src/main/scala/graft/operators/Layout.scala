package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering of a table
  * on two columns, the OPTIMIZE ZORDER BY of Delta/Iceberg re-expressed
  * as a plain deterministic projection + range bucketing.
  *
  * Why it matters at 100 TB: min/max zone maps (parquet row-group
  * stats) prune scans on the SORT column only. Interleaving the bits
  * of two columns' bin ids makes file ranges cover small RECTANGLES
  * of (x, y) space, so selective predicates on EITHER column skip
  * most files — the multi-dimensional clustering a single-column sort
  * cannot give. The operator emits the clustering key; production
  * writes then `repartitionByRange(files, col("zval"))` and sort
  * within partitions — the exact write shape `file_id` models
  * deterministically for the gate.
  *
  * All arithmetic is exact integer (`div`/`%` on BIGINT): bin =
  * `((v − min)·2^bits) div (max − min + 1)`, z-value = unrolled
  * bit-interleave of the two bin ids, file = `(z·files) div 4^bits`.
  * No floating point anywhere, so any engine buckets identically.
  * The min/max frame comes from a 1-row aggregate broadcast back into
  * the plan — no driver materialization.
  */
object Layout {

  /** Per-row clustering key: input columns + `bin_x`, `bin_y`,
    * `zval`, `file_id`.
    */
  def zorder(df: DataFrame, xCol: String, yCol: String,
             bits: Int = 8, files: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 20, s"zorder: bits must be in [1,20], got $bits")
    require(files >= 1, s"zorder: files must be >= 1, got $files")
    val nb = 1L << bits
    val stats = df.agg(
      min(col(xCol).cast("long")).as("zmin_x"),
      max(col(xCol).cast("long")).as("zmax_x"),
      min(col(yCol).cast("long")).as("zmin_y"),
      max(col(yCol).cast("long")).as("zmax_y"))
    val interleave = (0 until bits).map { b =>
      s"((bin_x div ${1L << b}) % 2) * ${1L << (2 * b)} + " +
        s"((bin_y div ${1L << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
    df.crossJoin(broadcast(stats))
      .withColumn("bin_x", expr(
        s"((cast($xCol as bigint) - zmin_x) * $nb) div (zmax_x - zmin_x + 1)"))
      .withColumn("bin_y", expr(
        s"((cast($yCol as bigint) - zmin_y) * $nb) div (zmax_y - zmin_y + 1)"))
      .withColumn("zval", expr(interleave))
      .withColumn("file_id", expr(s"(zval * $files) div ${nb * nb}"))
      .drop("zmin_x", "zmax_x", "zmin_y", "zmax_y")
  }

  /** Per-file clustering audit: row count and the (bin_x, bin_y)
    * bounding rectangle each z-range file covers — small rectangles =
    * both columns prune. This is the gate/report surface; the row
    * volume collapses map-side.
    */
  def zorderSummary(df: DataFrame, xCol: String, yCol: String,
                    bits: Int = 8, files: Int = 32): DataFrame =
    zorder(df, xCol, yCol, bits, files)
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("bin_x")).as("min_bx"), max(col("bin_x")).as("max_bx"),
        min(col("bin_y")).as("min_by"), max(col("bin_y")).as("max_by"))
}
