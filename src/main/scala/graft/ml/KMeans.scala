package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Similarity

/** Distributed k-means over an embedding column — the semantic-dedup /
  * corpus-clustering primitive of a training-data pipeline (cluster the
  * corpus, then sample or dedup within clusters).
  *
  * Two surfaces:
  *  - [[step]]: ONE deterministic Lloyd iteration over quantized-integer
  *    vectors (exact distances, exact integer dim-sums, one final IEEE
  *    division per mean) — DuckDB-oracle-checkable bit-for-bit.
  *  - [[fit]]: the real iterative loop in plain doubles for k iterations
  *    (spec-tested: within-cluster SS is non-increasing).
  *
  * Scale shape (the part that must survive 100 TB): centroids are k
  * rows — ALWAYS broadcast; assignment is a map-side nested loop over
  * the corpus scan (no corpus shuffle), followed by ONE partial-agg
  * shuffle of ≤ k×dims rows for the re-centering. Nothing driver-side
  * grows with the corpus; the per-iteration driver state is k×dim
  * doubles (the centroids), same as Spark MLlib's own implementation.
  */
object KMeans {

  /** Assign every point to its nearest centroid by exact quantized
    * squared L2: dist2 = |p|² + |c|² − 2·p·c over BIGINT — order-free.
    * Ties break on the smaller centroid id. Returns (id, cluster_id, qv).
    */
  def assignQuant(points: DataFrame, centroids: DataFrame,
                  idCol: String): DataFrame = {
    val p = points.select(col(idCol), col("qv"),
      Similarity.qnorm2(col("qv")).as("n2"))
    val c = centroids.select(col("cid"), col("cv"),
      Similarity.qnorm2(col("cv")).as("c2"))
    // Broadcast NL join: corpus stays map-side; k is tiny by contract.
    p.crossJoin(broadcast(c))
      .withColumn("dist2",
        col("n2") + col("c2") - lit(2L) * Similarity.qdot(col("qv"), col("cv")))
      // Partial-aggregated argmin: struct min is (dist2, cid)-lexicographic,
      // so the shuffle carries one candidate per point per map partition.
      .groupBy(col(idCol))
      .agg(min(struct(col("dist2"), col("cid"))).as("m"),
        first(col("qv")).as("qv"))
      .select(col(idCol), col("m.cid").as("cluster_id"), col("qv"))
  }

  /** One oracle-checkable Lloyd step on quantized vectors: centroids =
    * the points with id < k; output the per-(cluster, dim) member count
    * and quantized mean. dim is 1-based to match SQL list indexing.
    */
  def step(points: DataFrame, idCol: String, vecCol: String,
           k: Int): DataFrame = {
    val q = points.select(col(idCol), Similarity.quantVec(col(vecCol)).as("qv"))
    val cents = q.filter(col(idCol) < k)
      .select(col(idCol).as("cid"), col("qv").as("cv"))
    assignQuant(q, cents, idCol)
      .select(col("cluster_id"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), (col("pos") + 1).cast(LongType).as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .select(col("cluster_id"), col("dim"), col("n"),
        (col("sx").cast(DoubleType) / col("n").cast(DoubleType)).as("mean_q"))
  }

  /** Full Lloyd's loop in doubles. Initial centroids are the first k
    * points by id; each iteration re-broadcasts the k×dim centroid
    * table. Returns (id, cluster_id) assignments after `iters` rounds.
    */
  def fit(points: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .persist()
    var cents = pts.filter(col("id") < k)
      .select(col("id").as("cid"), col("v").as("cv"))
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      val d = pts.crossJoin(broadcast(cents))
        .withColumn("dist2", aggregate(
          zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      assigned = d.groupBy("id")
        .agg(min(struct(col("dist2"), col("cid"))).as("m"),
          first(col("v")).as("v"))
        .select(col("id"), col("m.cid").as("cluster_id"), col("v"))
      cents = assigned
        .select(col("cluster_id").as("cid"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cid"), transform(col("ps"), _.getField("m")).as("cv"))
    }
    val out = assigned.select(col("id"), col("cluster_id"))
    pts.unpersist()
    out
  }

  /** Within-cluster sum of squares for a (id, cluster_id) assignment —
    * the k-means objective, used by the spec to check monotonicity.
    */
  def wcss(points: DataFrame, assignment: DataFrame, idCol: String,
           vecCol: String): Double = {
    val pts = points.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val withC = pts.join(assignment, "id")
    val cents = withC
      .select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cluster_id", "pos").agg(avg(col("x")).as("m"))
    withC.select(col("cluster_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .join(cents, Seq("cluster_id", "pos"))
      .select(((col("x") - col("m")) * (col("x") - col("m"))).as("d2"))
      .agg(sum(col("d2"))).head().getDouble(0)
  }
}
