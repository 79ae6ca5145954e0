package graft.ml

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-k matrix factorization of the ratings matrix (reference A12:
  * generator_component.py:44-50 builds a rank_k MovieLens environment
  * whose user/item latent vectors drive the simulated bandit).
  *
  * Idiomatic Spark: MLlib ALS — distributed block factorization, no
  * driver-side matrix. Seeded for deterministic tests.
  */
object RankKFactorizer {

  final case class Factors(user: DataFrame, item: DataFrame)

  /** Factorize (user_id, item_id, rating) into rank-k latent factors.
    * Returns two DataFrames: (id, features array<float>) each.
    */
  def factorize(ratings: DataFrame, rank: Int, seed: Long = 42L,
                maxIter: Int = 10, regParam: Double = 0.1): Factors = {
    val als = new ALS()
      .setRank(rank)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setUserCol("user_id")
      .setItemCol("item_id")
      .setRatingCol("rating")
      .setColdStartStrategy("drop")
    val model = als.fit(ratings
      .select(col("user_id").cast("int"), col("item_id").cast("int"),
        col("rating").cast("float")))
    Factors(
      model.userFactors.toDF("id", "features"),
      model.itemFactors.toDF("id", "features"))
  }

  /** Predicted rating = dot(userVec, itemVec) — the environment's reward
    * function (generator_component.py:44-50: inner-product environment).
    */
  def predictRating(userVec: org.apache.spark.sql.Column,
                    itemVec: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(zip_with(userVec, itemVec, (a, b) => a * b),
      lit(0.0d), (acc, x) => acc + x)
}
