package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns.
  *
  * Scale design: the query set is broadcast; candidate scoring is a
  * map-only pass over the corpus; ranking is two-phase top-k (salted
  * partial rank, then final rank) so no single reducer sees the whole
  * corpus — the global-sort-free pattern that survives 100 TB.
  * The brute-force scorer is the exactness baseline; `annLsh` is the
  * sub-linear path (random-hyperplane buckets, verify inside bucket).
  */
object Similarity {

  private def r3(c: Column): Column = floor(c * 1000.0 + 0.5001) / 1000.0

  /** (vec_id, v: array<double>, norm) from the raw float embeddings. */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(zip_with(v, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")))

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  /** Exact cosine top-k per query vector (queries = `vec_id < nQueries`).
    * Two-phase rank keeps every partition's work bounded.
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = prepared(embeddings)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("vid"),
        r3(dot("v", "qv") / (col("norm") * col("qnorm"))).as("cos"))
    // phase 1: top-k within (qid, salt); phase 2: global top-k per qid
    val salted = scored.withColumn("salt", pmod(col("vid"), lit(32)))
      .withColumn("r1", row_number().over(
        Window.partitionBy(col("qid"), col("salt")).orderBy(col("cos").desc, col("vid"))))
      .where(col("r1") <= k).drop("salt", "r1")
    salted.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))))
      .where(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ `threshold`, vec_a < vec_b.
    * Brute force — the exact verifier; candidate generation at scale
    * is [[annLsh]]-style bucketing.
    */
  def cosineDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = prepared(embeddings)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        r3(dot("va", "vb") / (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Random-hyperplane LSH buckets: `nPlanes` md5-PRNG hyperplanes,
    * bucket = sign-bit signature. Near neighbours collide; search
    * cost drops from O(corpus) to O(bucket).
    */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int): DataFrame = {
    val e = prepared(embeddings)
    // plane p, dim d weight = u(p:d) - 0.5 via md5 (partition-invariant)
    val planeExpr = (0 until nPlanes).map { p =>
      s"""CASE WHEN aggregate(zip_with(v, transform(sequence(0, size(v) - 1),
         |  d -> (CAST(CONV(SUBSTRING(MD5(CONCAT('$p', ':', d)), 1, 8), 16, 10) AS BIGINT) % 100000) / 100000.0 - 0.5),
         |  (x, w) -> x * w), 0D, (acc, x) -> acc + x) > 0 THEN ${1L << p}L ELSE 0L END""".stripMargin
    }.mkString(" + ")
    e.select(col("vec_id"), col("v"), col("norm"), expr(planeExpr).as("bucket"))
  }

  /** ANN top-k via LSH buckets: score only same-bucket candidates,
    * rank within bucket. Recall < 1 by construction; the exactness
    * baseline is [[cosineTopK]].
    */
  def annLshTopK(embeddings: DataFrame, nPlanes: Int, nQueries: Int, k: Int): DataFrame = {
    val b = lshBuckets(embeddings, nPlanes)
    val qq = b.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"), col("bucket"))
    b.join(broadcast(qq), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("vid"),
        r3(dot("v", "qv") / (col("norm") * col("qnorm"))).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))))
      .where(col("rank") <= k)
  }
}
