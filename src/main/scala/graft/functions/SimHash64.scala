package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the 32-bit SimHash of a token
  * array in ONE pass per row — the scale path for
  * [[graft.operators.Dedup.simhash]], whose explode formulation
  * (doc × token × 32 bits) exists for oracle parity. Bit-identical to
  * it: md5 first 8 hex chars as unsigned 32-bit hash per distinct
  * token, per-bit ±1 majority, bit set iff the vote sum is > 0.
  *
  * Registered for SQL as `graft_simhash(array<string>)` via
  * [[SimHash64.register]] (preference order (b) from the build brief:
  * custom Expression before custom plans, after built-ins — built-ins
  * cannot fold 32 bit-votes in one pass without an explode).
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < arr.numElements()) {
      // null tokens are dropped, matching the explode formulation
      val tok = if (arr.isNullAt(i)) null
        else arr.get(i, org.apache.spark.sql.types.StringType)
          .asInstanceOf[UTF8String].toString
      if (tok != null && seen.add(tok)) {
        md.reset()
        val d = md.digest(tok.getBytes("UTF-8"))
        // first 4 digest bytes == first 8 hex chars, as unsigned 32-bit
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}

object SimHash64 {
  /** Expose as SQL function `graft_simhash`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHash64(exprs.head), "built-in")
}
