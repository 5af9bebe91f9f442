package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions route must make every graft function SQL-resolvable
  * in a session that never calls the programmatic register().
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions binds all functions at session build time") {
    // build a FRESH session with the extensions — the shared one (if
    // any) must be torn down or getOrCreate would return it unchanged
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = Session.tune(SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    assert(spark.sql(
      "SELECT graft_vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT graft_simhash(array('a', 'b')) AS s").head().getLong(0) >= 0L)
    assert(spark.sql("SELECT graft_lsh_bucket(array(1.0F, -1.0F), 4) AS b").head().getLong(0) >= 0L)
    assert(spark.sql("SELECT graft_minhash(array('a b c'), 4) AS m")
      .head().getSeq[Long](0).length === 4)
    // matches the programmatic registration bit-for-bit
    val viaRegister = {
      graft.functions.VectorExprs.register(spark)
      spark.sql("SELECT graft_simhash(array('x', 'y', 'z')) AS s").head().getLong(0)
    }
    assert(spark.sql("SELECT graft_simhash(array('x', 'y', 'z')) AS s").head().getLong(0)
      === viaRegister)

    // the Bloom pair resolves through the same route: build a filter
    // over 1..3, then probe a member and a non-member
    val hit = spark.sql(
      """WITH ks AS (SELECT explode(array(1L, 2L, 3L)) AS k),
        |bf AS (SELECT graft_bloom_agg(xxhash64(k), 100L, 800L) AS b FROM ks)
        |SELECT graft_bloom_contains((SELECT b FROM bf), xxhash64(2L)) AS yes,
        |       graft_bloom_contains((SELECT b FROM bf), xxhash64(99L)) AS no
        |""".stripMargin).head()
    assert(hit.getBoolean(0) === true)   // members always hit
    assert(hit.getBoolean(1) === false)  // 800 bits / 3 keys: fp ~ 0

    // builder misuse fails with the function name + signature, not an
    // opaque IndexOutOfBounds/ClassCast/unresolved-expression error
    def failureMessage(sql: String): String = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      msgs(e).mkString("\n")
    }
    assert(failureMessage("SELECT graft_minhash(array('a'))")
      .contains("graft_minhash"))                       // missing arg
    assert(failureMessage("SELECT graft_lsh_bucket(array(1.0F), array(1.0F))")
      .contains("graft_lsh_bucket"))                    // non-integer arg
    val nonLiteral = failureMessage(
      "SELECT graft_minhash(array('a'), CAST(id AS INT)) FROM range(1)")
    assert(nonLiteral.contains("graft_minhash") && nonLiteral.contains("literal"))
  }
}
