package graft.ml

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("invert: A * A^-1 == I for an SPD matrix") {
    val d = 3
    val a = Array(4.0, 1.0, 0.5, 1.0, 3.0, 0.2, 0.5, 0.2, 2.0)
    val inv = LinUcb.invert(a, d)
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      for (k <- 0 until d) s += a(i * d + k) * inv(k * d + j)
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"cell ($i,$j) = $s")
    }
  }

  test("fit recovers per-action linear reward weights") {
    // action 0 rewards dim0, action 1 rewards dim1; big n, tiny noise-free
    val rows = for {
      i <- 0 until 400
      action <- Seq(0, 1)
    } yield {
      val x = Array((i % 20) / 10.0 - 0.9, ((i * 7) % 20) / 10.0 - 0.9)
      val w = if (action == 0) Array(2.0, 0.0) else Array(0.0, -1.0)
      (action, x.toSeq, w(0) * x(0) + w(1) * x(1))
    }
    val df = rows.toDF("action", "x", "reward")
    val m = LinUcb.fit(df, "action", "x", "reward", dim = 2,
      alpha = 0.0, lambda = 1e-6)
    val t0 = m.actions.find(_.action == 0).get.theta
    val t1 = m.actions.find(_.action == 1).get.theta
    assert(math.abs(t0(0) - 2.0) < 1e-3 && math.abs(t0(1)) < 1e-3)
    assert(math.abs(t1(1) + 1.0) < 1e-3 && math.abs(t1(0)) < 1e-3)
    // greedy scoring picks the action with higher predicted reward
    val scored = LinUcb.score(m,
      Seq((Seq(0.9, 0.9), 0), (Seq(0.1, -0.9), 1)).toDF("obs", "want"),
      "obs")
    assert(scored.filter($"predicted_action" === $"want").count() == 2)
  }

  test("evaluate reports match rate and replay reward") {
    val train = Seq((0, Seq(1.0, 0.0), 2.0), (1, Seq(0.0, 1.0), 5.0))
      .toDF("action", "x", "reward")
    val m = LinUcb.fit(train, "action", "x", "reward", dim = 2,
      alpha = 0.0, lambda = 1e-6)
    // logged data: first row's action matches the policy, second doesn't
    val logged = Seq((0, Seq(1.0, 0.0), 2.0), (0, Seq(0.0, 1.0), 9.0))
      .toDF("action", "obs", "reward")
    val r = LinUcb.evaluate(m, logged, "action", "obs", "reward")
      .as[(Long, Long, Double)].head()
    assert(r == ((2L, 1L, 2.0)))
  }

  test("model save/load round-trips (A18)") {
    val df = Seq((0, Seq(1.0, 0.0), 1.0), (1, Seq(0.0, 1.0), 2.0))
      .toDF("action", "x", "reward")
    val m = LinUcb.fit(df, "action", "x", "reward", dim = 2)
    val path = Files.createTempDirectory("linucb").toString + "/model"
    LinUcb.save(spark, m, path)
    val m2 = LinUcb.load(spark, path)
    assert(m2.dim == m.dim && m2.alpha == m.alpha)
    assert(m2.actions.map(_.action) == m.actions.map(_.action))
    assert(m2.actions.zip(m.actions).forall { case (a, b) =>
      a.theta.sameElements(b.theta) && a.aInv.sameElements(b.aInv)
    })
  }

  test("trajectory generation is seeded-deterministic with the " +
      "reference's nested schema (A12)") {
    val ratings = Seq((1, 10, 3.0f), (1, 11, 4.0f), (2, 10, 1.0f),
      (2, 12, 5.0f), (3, 11, 2.0f)).toDF("user_id", "item_id", "rating")
    val f = RankKFactorizer.factorize(ratings, rank = 2, seed = 7L,
      maxIter = 3)
    val t1 = Simulation.generateTrajectories(spark, f, steps = 4,
      batchSize = 3, numActions = 3, seed = 9L)
    val t2 = Simulation.generateTrajectories(spark, f, steps = 4,
      batchSize = 3, numActions = 3, seed = 9L)
    assert(t1.schema.fieldNames.toSeq == Seq("step", "step_type",
      "observation", "action", "policy_info", "next_step_type",
      "reward", "discount"))
    assert(t1.count() == 4)
    assert(t1.exceptAll(t2).isEmpty && t2.exceptAll(t1).isEmpty)
    // flatten restores steps × batchSize transitions with aligned arrays
    val flat = Simulation.flattenForTraining(t1)
    assert(flat.count() == 12)
    assert(flat.filter(size($"obs") =!= 2).count() == 0)
    // the fused transition stream is the same multiset — the identity
    // q_bandit_loop's training path relies on (flatten ∘ nest = id)
    val fused = Simulation.transitions(spark, f, steps = 4,
      batchSize = 3, numActions = 3, seed = 9L)
    assert(fused.exceptAll(flat).isEmpty && flat.exceptAll(fused).isEmpty)
  }
}
