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
  }
}
