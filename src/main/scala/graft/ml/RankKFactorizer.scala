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
    *
    * `numBlocks` is the ALS user/item block count — the unit of both
    * shuffle parallelism and task count inside every ALS iteration.
    * MLlib's default (10) is a fixed constant; at cluster scale size it
    * so a block's ratings fit an executor's memory. Two measured
    * caveats (r16, q_bandit_loop at sf0.1): (1) locally it is NOT a
    * latency lever — blocks 10→4 cut tasks 360→228 with no wall-time
    * change (the query is driver-gap-bound, not task-bound); (2) the
    * block layout changes normal-equation summation ORDER, so the
    * learned factors differ numerically across block counts (verified:
    * a blocks=4 run diverged the bandit loop's reward sums entirely).
    * Registered queries therefore keep the default for
    * reproducibility; deployments re-tuning it re-baseline outputs.
    */
  def factorize(ratings: DataFrame, rank: Int, seed: Long = 42L,
                maxIter: Int = 10, regParam: Double = 0.1,
                numBlocks: Int = 10): Factors = {
    val als = new ALS()
      .setRank(rank)
      .setSeed(seed)
      .setMaxIter(maxIter)
      .setRegParam(regParam)
      .setNumUserBlocks(numBlocks)
      .setNumItemBlocks(numBlocks)
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
