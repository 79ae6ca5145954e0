package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded trajectory generator (A12, generator_component.py:36-71): a
  * random policy driven `steps × batchSize` steps over the rank-k
  * environment; emits nested trajectory rows in the reference schema
  * (step_type / observation / action / reward / discount arrays).
  *
  * Fully distributed + deterministic: "randomness" is xxhash64(seed, id)
  * — reproducible across runs and partitionings, no RNG state on the
  * driver. Factor tables broadcast (they are user×k and item×k — small
  * relative to trajectory volume even at 100 TB of output).
  */
object Simulation {

  /** Pseudo-uniform in [0, n) from a seeded hash of (seed, id, tag). */
  private def hmod(idCol: org.apache.spark.sql.Column, tag: String,
                   seed: Long, n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(lit(seed), idCol, lit(tag)), lit(n.toLong)).cast("int")

  /** Generate `steps` trajectory rows of `batchSize` transitions each.
    *
    * Environment: observation = the sampled user's latent vector;
    * action ∈ [0, numActions) picks an item; reward = dot(user, item)
    * (the matrix-factorization environment of generator_component.py).
    */
  def generateTrajectories(spark: SparkSession, factors:
      RankKFactorizer.Factors, steps: Int, batchSize: Int,
      numActions: Int, seed: Long = 42L): DataFrame = {
    val joined = joinedTransitions(spark, factors, steps, batchSize,
      numActions, seed)
    // Nest into the reference trajectory schema: arrays ordered by slot.
    joined
      .groupBy("step")
      .agg(
        transform(array_sort(collect_list(struct(col("slot"),
          col("action"), col("reward"), col("obs")))),
          s => s.getField("action").cast("long")).as("action"),
        transform(array_sort(collect_list(struct(col("slot"),
          col("obs")))),
          s => struct(s.getField("obs").as("observation_batch")))
          .as("observation"),
        transform(array_sort(collect_list(struct(col("slot"),
          col("reward")))), s => s.getField("reward")).as("reward"))
      .withColumn("step_type",
        transform(col("action"), _ => lit(1L)))
      .withColumn("next_step_type",
        transform(col("action"), _ => lit(1L)))
      .withColumn("discount",
        transform(col("reward"), _ => lit(1.0d)))
      .withColumn("policy_info", array().cast("array<double>"))
      .select("step", "step_type", "observation", "action",
        "policy_info", "next_step_type", "reward", "discount")
  }

  /** The shared simulation core: one row per (step, slot) transition
    * with its sampled user's latent obs, the action, and the rank-k
    * inner-product reward — broadcast factor lookups only, no shuffle
    * of the transition stream.
    */
  private def joinedTransitions(spark: SparkSession, factors:
      RankKFactorizer.Factors, steps: Int, batchSize: Int,
      numActions: Int, seed: Long): DataFrame = {
    // Persisted: the factor tables are tiny (dims of the rank-k env)
    // but sit atop the ITERATIVE ALS lineage — every extra pass
    // (zipIndex samples + counts, the nItems lookup) would re-run the
    // whole factorization without the cache.
    val users = factors.user
      .select(col("id").as("user_id"),
        col("features").cast("array<double>").as("obs"))
      .persist()
    val items = factors.item
      .select(col("id").as("item_id"),
        col("features").cast("array<double>").as("ivec"))
      .persist()
    // ONE job for both table sizes (r17: separate users.count() +
    // items.count() each scheduled a driver job in a query whose cost
    // is driver-gap-bound — the union folds them into a single
    // two-stage action that also materializes both persists). Each
    // branch carries a literal tag and the counts are selected by it:
    // UnionExec preserves child order today, but no API contract says
    // so, and a silent reorder would transpose nUsers/nItems without
    // any failure (ADVICE r17).
    val cnts = users.select(lit("u").as("side"), count(lit(1)).as("n"))
      .unionAll(items.select(lit("i").as("side"), count(lit(1)).as("n")))
      .collect()
    val bySide = cnts.map(r => r.getString(0) -> r.getLong(1)).toMap
    require(bySide.size == 2, s"expected u+i count rows, got ${cnts.toSeq}")
    val nUsers = bySide("u").toInt
    val nItems = bySide("i")
    // One row per transition; trajectory id = step, position = slot.
    val base = spark.range(steps.toLong * batchSize)
      .withColumn("step", (col("id") / batchSize).cast("int"))
      .withColumn("slot", pmod(col("id"), lit(batchSize)).cast("int"))
      .withColumn("user_pick", hmod(col("id"), "u", seed, nUsers))
      .withColumn("action", hmod(col("id"), "a", seed, numActions))
    // Factor lookups: broadcast hash joins, no shuffle of `base`.
    // Actions index items positionally (action a → a-th item by id), so
    // both factor tables get a dense 0-based pick column. row_number
    // over a global order is the SAME id-ordered dense index the
    // earlier zipIndex assigned (bit-identical picks, MlSpec) without
    // its range-shuffle + RDD zipWithIndex round trip — two fewer
    // driver-scheduled materializations per invocation (r17). The
    // unpartitioned window is safe HERE because both tables are
    // broadcast two lines later: anything that fits a broadcast fits
    // one window partition. Corpus-scale indexing keeps using
    // Relational.zipIndex.
    val w = org.apache.spark.sql.expressions.Window
    val userIdx = users.withColumn("user_pick",
      (row_number().over(w.orderBy(col("user_id"))) - 1).cast("int"))
    val itemIdx = items.withColumn("item_pick",
      (row_number().over(w.orderBy(col("item_id"))) - 1).cast("int"))
    base
      .join(broadcast(userIdx), "user_pick")
      .join(broadcast(itemIdx),
        pmod(col("action"), lit(nItems)).cast("int") ===
          col("item_pick"))
      .withColumn("reward",
        RankKFactorizer.predictRating(col("obs"), col("ivec")))
  }

  /** Per-transition training rows DIRECTLY — the fusion of
    * [[generateTrajectories]] followed by [[flattenForTraining]].
    *
    * `flatten(nest(x)) = x` as a multiset of (step, action, obs,
    * reward) rows, and every downstream consumer (LinUCB sufficient
    * stats, scoring aggregates) is row-order-independent, so the fused
    * form is exactly equivalent — it just skips the groupBy(step) →
    * collect_list/array_sort → explode round trip, which at 100 TB of
    * trajectories is a full corpus shuffle plus array assembly bought
    * for nothing. The nested form stays the interchange/persistence
    * shape (A10/A16: TFRecord round trip, reference schema parity);
    * training loops should use this one.
    */
  def transitions(spark: SparkSession, factors: RankKFactorizer.Factors,
                  steps: Int, batchSize: Int, numActions: Int,
                  seed: Long = 42L): DataFrame =
    joinedTransitions(spark, factors, steps, batchSize, numActions, seed)
      .select(col("step"), col("action").cast("long").as("action"),
        col("obs"), col("reward"))

  /** Flatten trajectories to per-transition rows for training (A7
    * un-nest + A17 input shape): (action, obs, reward).
    */
  def flattenForTraining(traj: DataFrame): DataFrame =
    traj.select(col("step"),
        explode(arrays_zip(col("action"), col("observation"),
          col("reward"))).as("t"))
      .select(col("step"),
        col("t.action").as("action"),
        col("t.observation.observation_batch").as("obs"),
        col("t.reward").as("reward"))
}
