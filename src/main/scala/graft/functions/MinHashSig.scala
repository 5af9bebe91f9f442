package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle array in ONE pass per row: for each
  * distinct shingle, h = its md5's first 8 hex chars as an unsigned
  * 32-bit integer; signature slot p = min over shingles of the
  * universal hash `((2p+1)·h + p) mod 4294967291`.
  *
  * Scale rationale: the explode formulation (shingle explode →
  * |docs|×|shingles|×|perms| rows → groupBy MIN) shuffles the shingle
  * explosion; this expression keeps everything inside the map task —
  * the only thing that ever leaves is |perms| longs per document.
  * Values are integer-exact and identical to the explode/SQL
  * formulation (OracleSql.dedupMinhashLsh), permutation-count and
  * partitioning independent.
  *
  * Cost is dominated by the md5 digests themselves, so interpreted
  * eval (CodegenFallback) is within noise of codegen here.
  * Empty/too-short docs (no shingles to take the min over) yield NULL
  * — an all-MaxValue sentinel would make any two shingle-less docs
  * LSH-collide as "duplicates"; NULL lets the operator filter them.
  */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression with CodegenFallback {

  private val PRIME = 4294967291L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(perms)(Long.MaxValue)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < arr.numElements()) {
      val sh = if (arr.isNullAt(i)) null
        else arr.get(i, StringType).asInstanceOf[UTF8String].toString
      if (sh != null && seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var p = 0
        while (p < perms) {
          val u = ((2L * p + 1L) * h + p) % PRIME
          if (u < mins(p)) mins(p) = u
          p += 1
        }
      }
      i += 1
    }
    if (seen.isEmpty) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
