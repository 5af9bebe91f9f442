package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level checks of the driver contract on sf0.001. */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared oracle has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every query is oracle-checked (no silent rows-only fallbacks)") {
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty,
      s"queries without a DuckDB oracle (driver downgrades them to a rows-only check): $unchecked")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows") {
      assert(fn(spark, dir).count() > 0)
    }
  }
}
