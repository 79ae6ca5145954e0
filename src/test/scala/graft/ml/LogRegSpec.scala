package graft.ml

import graft.SparkSpec

class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable toy set: y = 1 iff x1 > 0
  private def toy = Seq(
    (Array(1.0f, 0.3f), 1L), (Array(0.8f, -0.2f), 1L),
    (Array(1.2f, 0.1f), 1L), (Array(-1.0f, 0.2f), 0L),
    (Array(-0.9f, -0.3f), 0L), (Array(-1.1f, 0.0f), 0L)
  ).toDF("x", "y")

  test("gradStep from w=0 matches the hand-computed integer gradient") {
    val rows = LogReg.gradStep(toy, "x", "y", lr = 0.1)
      .orderBy("dim").collect()
    assert(rows.length === 2)
    val xs = Seq((1.0f, 1L), (0.8f, 1L), (1.2f, 1L),
      (-1.0f, 0L), (-0.9f, 0L), (-1.1f, 0L))
    val expect1 = xs.map { case (x, y) =>
      math.floor(x.toDouble * 1e6).toLong * (1L - 2L * y)
    }.sum
    assert(rows(0).getAs[Long]("grad_sum") === expect1)
    // positive-class dim has negative gradient => w1 moves positive
    assert(rows(0).getAs[Double]("w1") > 0.0)
    assert(rows(0).getAs[Double]("w1") ===
      -0.1 * (expect1.toDouble / (2L * 1000000L * 6L).toDouble))
  }

  test("fit reduces log-loss and separates the toy set") {
    val w0 = Array(0.0, 0.0)
    val l0 = LogReg.logLoss(toy, "x", "y", w0)
    val w = LogReg.fit(toy, "x", "y", iters = 20, lr = 1.0)
    val l = LogReg.logLoss(toy, "x", "y", w)
    assert(l < l0) // strictly better than the zero model
    val scored = LogReg.score(toy, "x", w)
      .select("y", "p_quality").collect()
    assert(scored.forall { r =>
      val correct = if (r.getLong(0) == 1L) r.getDouble(1) > 0.5
      else r.getDouble(1) < 0.5
      correct
    })
  }
}
