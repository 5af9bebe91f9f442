package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Local testing runs `local[N]`; on a real cluster only `master`
  * changes — shuffle partitioning is the documented knob
  * (`spark.sql.shuffle.partitions` ≈ 2-3× total cores at 100 TB,
  * with AQE coalescing handling the long tail).
  */
object Session {

  /** Configs every entry point (Verify, Bench, tests) must share. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    // driver testdata writes TIMESTAMP(NANOS); read as long, see Tables.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bucketed-table data (Formats.writeBucketed) goes to tmp, not cwd;
    // pid-suffixed so concurrent JVMs (tests + bench) never collide on
    // the same warehouse path / table names
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")

  def local(cores: Int = 32): SparkSession = {
    val s = tune(SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
