package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter semi-join reduction, exposed from Spark's own
  * catalyst expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain` — the machinery behind the optimizer's
  * InjectRuntimeFilter rule, public classes but not registered as SQL
  * functions). Registering them under graft names makes the
  * *explicit* semi-join-reduction pattern available to operators: a
  * compact bitset summary of a stored index's join keys, broadcast
  * and applied BEFORE the probe side's exchange, so keys that cannot
  * match never shuffle at all. Bloom filters have no false negatives,
  * so results are bit-identical to the unfiltered plan — only the
  * cost changes.
  *
  *   - `graft_bloom_agg(xxhash64(k), nItems, nBits)` → binary
  *   - `graft_bloom_contains(bloom, xxhash64(k))` → boolean
  */
object BloomExprs {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_bloom_agg" -> { exprs =>
      VectorExprs.requireArity("graft_bloom_agg",
        "graft_bloom_agg(hash_long, n_items, n_bits)", exprs, 3)
      new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
    },
    "graft_bloom_contains" -> { exprs =>
      VectorExprs.requireArity("graft_bloom_contains",
        "graft_bloom_contains(bloom, hash_long)", exprs, 2)
      new BloomFilterMightContain(exprs(0), exprs(1))
    })

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, build) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, build, "built-in")
    }
  }
}
