package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExprs

/** Library packaging for the graft SQL functions: add
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every session —
  * including thriftserver/connect sessions that never run Scala code —
  * gets `graft_vec_dot`, `graft_lsh_bucket`, `graft_minhash`,
  * `graft_simhash` resolved like built-ins.
  *
  * The imperative alternative ([[graft.functions.VectorExprs.register]])
  * stays for programmatic use; both routes bind the same Expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Builders delegate to VectorExprs.build, which validates arity and
    // literal-ness up front and fails with the function name + expected
    // signature (a raw exprs(1).eval() would surface as an unresolved-
    // expression error, IndexOutOfBounds, or ClassCastException that
    // names no function at all).
    VectorExprs.USAGE.foreach { case (name, usage) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        (exprs: Seq[Expression]) => VectorExprs.build(name, exprs)))
    }
    // Bloom semi-join reduction pair (Spark's own catalyst expressions
    // under graft names — see graft.functions.BloomExprs)
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "graft_bloom_agg(hash_long, n_items, n_bits)"),
      (exprs: Seq[Expression]) => {
        graft.functions.VectorExprs.requireArity("graft_bloom_agg",
          "graft_bloom_agg(hash_long, n_items, n_bits)", exprs, 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "graft_bloom_contains(bloom, hash_long)"),
      (exprs: Seq[Expression]) => {
        graft.functions.VectorExprs.requireArity("graft_bloom_contains",
          "graft_bloom_contains(bloom, hash_long)", exprs, 2)
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))
      }))
  }
}
