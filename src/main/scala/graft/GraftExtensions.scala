package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LshBucket, MinHashSig, SimHash64, VecDot}

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
    ext.injectFunction((FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "graft_vec_dot(a, b) - dot product of two float/double arrays"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket", "graft_lsh_bucket(v, nPlanes) - random-hyperplane LSH bucket id"),
      (exprs: Seq[Expression]) => LshBucket(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, perms) - MinHash signature array"),
      (exprs: Seq[Expression]) => MinHashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 32-bit SimHash of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
  }
}
