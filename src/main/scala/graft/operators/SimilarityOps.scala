package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>): brute-force
  * cosine top-k as the exact baseline, random-hyperplane LSH bucketing as
  * the scale path, and cosine near-duplicate pairs.
  *
  * Scale design:
  *  - All vector math is pure column expressions (`zip_with` + `aggregate`)
  *    inside whole-stage codegen — no UDF boxing per element.
  *  - Brute-force top-k broadcasts the QUERY set (small) against the corpus
  *    (huge): one pass, no shuffle of the corpus, then a per-query window
  *    rank on the (corpus x queries) product — the corpus side never moves.
  *  - The hyperplane code is a per-row expression; candidate generation is
  *    an equi-join on the code, turning O(n²) into bucket-local work. The
  *    hyperplanes are md5-derived ±1 vectors, so codes are deterministic
  *    and engine-portable (no stored model needed).
  */
object SimilarityOps {

  /** Cast array<float> to array<double> for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Queries broadcast; corpus stays put. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(qidCol).as("query_id"), asDouble(col(qvecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** All near-duplicate pairs by cosine >= threshold (brute-force; the
    * LSH-bucketed variant below is the scale path). */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** md5-derived ±1 pseudo-random hyperplane sign for (plane, dim). */
  private def planeSign(p: Column, d: Column): Column =
    when(conv(substring(md5(concat(p.cast("string"), lit(":"), d.cast("string"))),
      1, 1), 16, 10).cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** LSH-bucketed approximate top-k: rank only within same-code buckets.
    * Recall < 1 by construction; trade off with `planes` (fewer planes =
    * bigger buckets = higher recall & cost). */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, qidCol: String, qvecCol: String,
              k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("code", hyperplaneCode(col("v"), planes))
    val q = queries.select(col(qidCol).as("query_id"), asDouble(col(qvecCol)).as("qv"))
      .withColumn("qcode", hyperplaneCode(col("qv"), planes))
    val scored = c.join(broadcast(q),
        col("code") === col("qcode") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Random-hyperplane LSH code, packed: Σ (v·h_p > 0) << p. Bit p is the
    * sign of the projection onto an md5-derived ±1 hyperplane — SimHash for
    * vectors; cosine-similar vectors agree on most bits. */
  def hyperplaneCode(v: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val dims = sequence(lit(0), size(v) - 1)
        val proj = aggregate(
          zip_with(v, dims, (x, d) => x * planeSign(p, d)),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, expr("1")).otherwise(lit(0)).cast("long") * pow(lit(2.0), p).cast("long")
      }),
      lit(0L), (acc, x) => acc + x)
}
