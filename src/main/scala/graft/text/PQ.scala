package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Similarity.{quantVec, qdot, qnorm2}

/** Product quantization — the memory side of large-scale ANN (IVF is
  * the routing side): each vector splits into `m` subspaces, each
  * subvector is replaced by the id of its nearest sub-codebook entry,
  * compressing dim×4 bytes to m codes. At 100 TB the corpus lives as
  * codes (RAM-resident per executor); exact vectors stay in cold
  * storage for optional re-ranking.
  *
  * Codebooks here are data-derived and deterministic (the subvectors
  * of the first k ids), keeping the whole encode DuckDB-expressible —
  * one plan shape away from k-means-trained codebooks (swap the
  * centroid source; the assign/encode plan is identical).
  *
  * Scale shape: codebooks are m×k subvectors — broadcast, model-sized;
  * the encode is a map-side broadcast join over the exploded
  * (vector, subspace) stream plus ONE partial-aggregated argmin
  * shuffle carrying ≤ one candidate per (vector, subspace) per map
  * partition. Distances are exact BIGINT over quantized values.
  */
object PQ {

  /** Encode every vector: per (vec, subspace) the nearest codebook id
    * and its exact quantized squared distance. dim must equal m × sub.
    * Output: (id, sub_id, code, dist2), one row per id × subspace.
    */
  def pqEncode(points: DataFrame, idCol: String, vecCol: String,
               k: Int, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    def subspaces(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
          quantVec(col(vecCol)).as("qv"))
        .select(col(outId), posexplode(
          transform(sequence(lit(0), lit(m - 1)),
            s => slice(col("qv"), s * sub + lit(1), lit(sub))))
          .as(Seq("sub_id", "sv")))
    val pts = subspaces(points, "__pid")
    val code = subspaces(points.filter(col(idCol) < k), "__cid")
      .select(col("__cid"), col("sub_id"), col("sv").as("cv"),
        qnorm2(col("sv")).as("c2"))
    pts.withColumn("p2", qnorm2(col("sv")))
      .join(broadcast(code), "sub_id")
      .withColumn("dist2",
        col("p2") + col("c2") - lit(2L) * qdot(col("sv"), col("cv")))
      .groupBy(col("__pid"), col("sub_id"))
      .agg(min(struct(col("dist2"), col("__cid"))).as("best"))
      .select(col("__pid").as("id"), col("sub_id").cast(LongType),
        col("best.__cid").as("code"), col("best.dist2").as("dist2"))
  }

  /** Asymmetric-distance (ADC) top-n: approximate each query→vector
    * distance as the sum over subspaces of the exact distance from the
    * query's subvector to the vector's CODE centroid. The per-query
    * lookup table (m×k distances) comes from the same broadcast
    * codebook; the scan side touches only codes.
    */
  def adcTopK(codes: DataFrame, queries: DataFrame, points: DataFrame,
              idCol: String, vecCol: String, k: Int, m: Int, dim: Int,
              topN: Int): DataFrame = {
    val sub = dim / m
    def subspaces(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId), quantVec(col(vecCol)).as("qv"))
        .select(col(outId), posexplode(
          transform(sequence(lit(0), lit(m - 1)),
            s => slice(col("qv"), s * sub + lit(1), lit(sub))))
          .as(Seq("sub_id", "sv")))
    val codebook = subspaces(points.filter(col(idCol) < k), "__cid")
      .select(col("__cid"), col("sub_id"), col("sv").as("cv"),
        qnorm2(col("sv")).as("c2"))
    // per-query LUT: distance from each query subvector to each centroid
    val lut = subspaces(queries, "query_id")
      .withColumn("q2", qnorm2(col("sv")))
      .join(broadcast(codebook), "sub_id")
      .select(col("query_id"), col("sub_id"), col("__cid").as("code"),
        (col("q2") + col("c2") - lit(2L) * qdot(col("sv"), col("cv")))
          .as("d2"))
    val scored = codes.join(lut, Seq("sub_id", "code"))
      .groupBy(col("query_id"), col("id").as("nbr_id"))
      .agg(sum(col("d2")).as("adc_dist2"))
      .filter(col("query_id") =!= col("nbr_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("adc_dist2").asc, col("nbr_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("query_id"), col("nbr_id"), col("adc_dist2"),
        col("rnk").cast(LongType).as("rnk"))
  }
}
