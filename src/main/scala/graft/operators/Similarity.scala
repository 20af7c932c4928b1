package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns (SURVEY §2
  * ops 51-52). Baseline: brute-force cosine top-k (exact, O(Q·N) — fine
  * when the query side is small/broadcastable). Scale path: LSH
  * random-hyperplane bucketing, which shuffles on bucket keys so the
  * candidate set per query is bounded.
  */
object Similarity {

  /** Sequential-fold dot product over array<double> columns — the fold
    * order is the array order, so the result is bit-reproducible across
    * engines (unlike a parallel SUM).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k cosine neighbors for each query vector. The query side
    * is expected to be small → Spark broadcasts it; ranking is a window
    * per query id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component: md5-derived
    * uniform in [-1, 1) for (plane p, dimension d). Engine-neutral (no
    * RNG state, no driver-side plane materialization).
    */
  private def planeComponent(p: Column, d: Column): Column =
    conv(substring(md5(concat(p.cast("string"), lit("_"), d.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(2147483648.0) - 1.0

  /** Sign bucket of a vector under `planes` md5-derived hyperplanes:
    * bit p = 1 iff dot(v, plane_p) >= 0. Vectors in the same bucket are
    * ANN candidates.
    */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = transform(sequence(lit(0), lit(planes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeComponent(p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    })
    aggregate(zip_with(bits, sequence(lit(0), lit(planes - 1)),
      (bit, p) => bit * pow(lit(2.0), p).cast("int")), lit(0), (acc, x) => acc + x)
  }

  /** LSH-bucketed ANN: brute-force ranking *within* sign buckets.
    * Recall < 1 (approximate by design); at 100 TB this shuffles on the
    * bucket key instead of broadcasting the whole corpus.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    val scored = c.join(q, "bucket")
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
