package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (ARRAY<FLOAT>), north_star
  * surface: brute-force cosine top-k as the exact baseline, plus a
  * sign-LSH bucketed variant as the 100 TB scale path.
  *
  * Determinism scheme (shared with the DuckDB oracle): each float is
  * quantized to BIGINT via floor(double(x) * 1e6); dot products and
  * norms are then exact integer sums (order-independent), and cosine =
  * qdot / sqrt(qnormA * qnormB) is a single IEEE division+sqrt over
  * identical integers — bit-equal across engines. With |x| <= ~8 and
  * dim <= 1024 the integer sums stay < 2^53, far from overflow.
  */
object Similarity {

  /** floor(x * 1e6) as BIGINT — the shared quantizer. */
  def quant(x: Column): Column =
    floor(x.cast(DoubleType) * 1e6).cast(LongType)

  def quantVec(v: Column): Column = transform(v, quant(_))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  /** Exact integer squared norm of a quantized vector. */
  def qnorm2(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Quantized cosine similarity — deterministic double. */
  def qcosine(qa: Column, na2: Column, qb: Column, nb2: Column): Column =
    qdot(qa, qb).cast(DoubleType) /
      sqrt(na2.cast(DoubleType) * nb2.cast(DoubleType))

  /** Brute-force exact cosine top-k: for every query vector, the k
    * nearest non-identical vectors by quantized cosine, ties broken on
    * neighbor id. The query side is broadcast — at scale this is a
    * map-side nested loop over the corpus scan (no corpus shuffle) and
    * one small shuffle for the per-query top-k window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      quantVec(col(vecCol)).as("qv"))
      .withColumn("n2", qnorm2(col("qv")))
    val q = queries.select(col(idCol).as("query_id"),
      quantVec(col(vecCol)).as("qw"))
      .withColumn("m2", qnorm2(col("qw")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        qcosine(col("qv"), col("n2"), col("qw"), col("m2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("nbr_id"), col("cosine"),
        col("rnk").cast(LongType).as("rnk"))
  }

  /** Sign-LSH bucket id over the first `bits` dimensions: bit i set iff
    * v[i] > 0. Deterministic, cheap, SQL-expressible — the IVF-style
    * coarse quantizer for the scale path. (A production variant swaps in
    * random-projection hyperplanes; axis-aligned keeps the oracle
    * expressible while exercising the identical plan shape.)
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) > 0f, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** Bucketed ANN top-k: queries probe only their own sign-LSH bucket.
    * One equi-join on the bucket key (shuffle co-partitions both sides),
    * then the same exact rescoring as brute force — candidate volume
    * drops by ~2^bits while recall degrades gracefully.
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"),
      quantVec(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", qnorm2(col("qv")))
    val q = queries.select(col(idCol).as("query_id"),
      quantVec(col(vecCol)).as("qw"),
      signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("m2", qnorm2(col("qw")))
    val scored = c.join(q, "bucket")
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("cosine",
        qcosine(col("qv"), col("n2"), col("qw"), col("m2")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("nbr_id"), col("cosine"),
        col("rnk").cast(LongType).as("rnk"))
  }

  /** All embedding pairs with cosine >= minCosine (near-dup detection).
    * Exact: block-nested-loop over id-ordered pairs. The LSH-bucketed
    * approximation for true 100 TB scale is `bucketedPairs`.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  minCosine: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), quantVec(col(vecCol)).as("qv"))
      .withColumn("n2", qnorm2(col("qv")))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", qcosine(col("a.qv"), col("a.n2"),
        col("b.qv"), col("b.n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("cosine"))
  }

  /** Approximate near-dup pairs: only pairs colliding in the sign-LSH
    * bucket are scored — linear-ish in data size for spread-out buckets.
    */
  def bucketedPairs(df: DataFrame, idCol: String, vecCol: String,
                    minCosine: Double, bits: Int): DataFrame = {
    val v = df.select(col(idCol).as("id"), quantVec(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", qnorm2(col("qv")))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", qcosine(col("a.qv"), col("a.n2"),
        col("b.qv"), col("b.n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("cosine"))
  }
}
