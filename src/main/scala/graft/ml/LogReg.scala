package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Similarity

/** Distributed logistic regression over an embedding column — the
  * fastText-style quality-classifier primitive of a training-data
  * pipeline (label a seed set, fit a linear model, score the corpus).
  *
  * Two surfaces:
  *  - [[gradStep]]: the FIRST batch-gradient step from w=0, where
  *    sigmoid(0) = 1/2 exactly, so the gradient is a pure integer sum
  *    over quantized features — DuckDB-oracle-checkable bit-for-bit.
  *  - [[fit]]/[[score]]: the real multi-step loop in doubles
  *    (spec-tested: training loss decreases, accuracy beats chance).
  *
  * Scale shape: each gradient is ONE map-side-combined aggregation to
  * dim rows (posexplode → partial sums per partition → dim-row shuffle);
  * the weight vector (dim doubles) is the only driver state and is
  * re-broadcast per step — the standard distributed-GD layout.
  */
object LogReg {

  /** First gradient step from w = 0 on quantized features.
    * grad_sum(j) = Σ_i qx_ij · (1 − 2·y_i)   (exact BIGINT; the ½ from
    * sigmoid(0) and the 1e6 quantizer are factored out), then
    * grad(j) = grad_sum / (2·1e6·N) and w1(j) = −lr · grad(j) — two
    * IEEE ops, bit-equal across engines. Output one row per 1-based dim.
    */
  def gradStep(points: DataFrame, vecCol: String, labelCol: String,
               lr: Double): DataFrame = {
    val v = points.select(
      Similarity.quantVec(col(vecCol)).as("qv"),
      col(labelCol).cast(LongType).as("y"))
    val n = v.agg(count(lit(1)).as("n"))
    v.select(posexplode(col("qv")).as(Seq("pos", "x")), col("y"))
      .groupBy((col("pos") + 1).cast(LongType).as("dim"))
      .agg(sum(col("x") * (lit(1L) - lit(2L) * col("y"))).as("grad_sum"))
      .crossJoin(broadcast(n))
      .select(col("dim"), col("grad_sum"),
        (lit(-lr) * (col("grad_sum").cast(DoubleType) /
          (lit(2L) * lit(1000000L) * col("n")).cast(DoubleType))).as("w1"))
  }

  /** Integer "one-step logit": score_i = Σ_j qx_ij · w_j with
    * w_j = −grad_sum_j from [[gradStep]] — the exact-integer direction
    * the first gradient step moves in (positive ⇒ class 1). Entirely
    * BIGINT, so rankings/thresholds over it are oracle-exact. The
    * gradient row table (dim rows) broadcasts; scoring is one
    * partial-aggregated sum per point.
    */
  def intScore(points: DataFrame, idCol: String, vecCol: String,
               labelCol: String): DataFrame = {
    val v = points.select(col(idCol), Similarity.quantVec(col(vecCol))
      .as("qv"), col(labelCol).cast(LongType).as("y"))
    val g = v.select(posexplode(col("qv")).as(Seq("pos", "x")), col("y"))
      .groupBy((col("pos") + 1).cast(LongType).as("dim"))
      .agg(sum(col("x") * (lit(1L) - lit(2L) * col("y"))).as("gsum"))
    v.select(col(idCol), col("y"),
        posexplode(col("qv")).as(Seq("pos", "x")))
      .withColumn("dim", (col("pos") + 1).cast(LongType))
      .join(broadcast(g), "dim")
      .groupBy(col(idCol), col("y"))
      .agg(sum(col("x") * -col("gsum")).as("score"))
  }

  /** Batch gradient descent in doubles: `iters` full-batch steps with a
    * constant rate. Returns the weight vector (0-based index, weight).
    */
  def fit(points: DataFrame, vecCol: String, labelCol: String,
          iters: Int, lr: Double): Array[Double] = {
    val pts = points.select(
      col(vecCol).cast(ArrayType(DoubleType)).as("x"),
      col(labelCol).cast(DoubleType).as("y"))
      .persist()
    val dim = pts.select(size(col("x"))).head().getInt(0)
    var w = Array.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      val wCol = typedLit(w.toSeq)
      // p = sigmoid(w·x); per-dim gradient via posexplode + partial agg.
      val g = pts
        .withColumn("p", lit(1.0) / (lit(1.0) +
          exp(-aggregate(zip_with(col("x"), wCol, (a, b) => a * b),
            lit(0.0), (acc, t) => acc + t))))
        .select(posexplode(col("x")).as(Seq("pos", "xj")),
          (col("p") - col("y")).as("r"))
        .groupBy("pos").agg(avg(col("xj") * col("r")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.indices.map(j => w(j) - lr * g(j)).toArray
    }
    pts.unpersist()
    w
  }

  /** Score a corpus with a fitted weight vector: P(y=1 | x). */
  def score(points: DataFrame, vecCol: String, w: Array[Double]): DataFrame =
    points.withColumn("p_quality", lit(1.0) / (lit(1.0) +
      exp(-aggregate(zip_with(col(vecCol).cast(ArrayType(DoubleType)),
        typedLit(w.toSeq), (a, b) => a * b), lit(0.0), (acc, t) => acc + t))))

  /** Mean log-loss of weights w on the corpus (spec helper). */
  def logLoss(points: DataFrame, vecCol: String, labelCol: String,
              w: Array[Double]): Double =
    score(points, vecCol, w)
      .select(col(labelCol).cast(DoubleType).as("y"), col("p_quality"))
      .select((-col("y") * log(col("p_quality")) -
        (lit(1.0) - col("y")) * log(lit(1.0) - col("p_quality"))).as("l"))
      .agg(avg(col("l"))).head().getDouble(0)
}
