package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def toyPoints = Seq(
    // two tight blobs around (0,0) and (10,10) plus ids 0/1 as seeds
    (0L, Array(0.1f, 0.0f)), (2L, Array(0.2f, -0.1f)),
    (4L, Array(-0.1f, 0.15f)),
    (1L, Array(10.0f, 10.1f)), (3L, Array(9.9f, 10.0f)),
    (5L, Array(10.2f, 9.8f))
  ).toDF("id", "v")

  test("step assigns blobs to their seed centroid and means are exact") {
    val out = KMeans.step(toyPoints, "id", "v", k = 2)
      .orderBy("cluster_id", "dim").collect()
    // 2 clusters x 2 dims
    assert(out.length === 4)
    // blob membership: ids {0,2,4} -> centroid 0, {1,3,5} -> centroid 1
    assert(out.forall(_.getAs[Long]("n") === 3L))
    // quantized mean of dim 1 for cluster 0: floor-quantized
    // (0.1, 0.2, -0.1) -> exact integer sum / 3
    val c0d1 = out.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    val q = Seq(0.1f, 0.2f, -0.1f)
      .map(f => math.floor(f.toDouble * 1e6).toLong).sum
    assert(c0d1.getAs[Double]("mean_q") === q.toDouble / 3.0)
  }

  test("fit converges: wcss is non-increasing across Lloyd iterations") {
    val pts = toyPoints
    val w1 = KMeans.wcss(pts, KMeans.fit(pts, "id", "v", 2, 1), "id", "v")
    val w3 = KMeans.wcss(pts, KMeans.fit(pts, "id", "v", 2, 3), "id", "v")
    assert(w3 <= w1 + 1e-9)
    // and the blobs separate perfectly
    val asg = KMeans.fit(pts, "id", "v", 2, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(asg(0L), asg(2L), asg(4L)).size === 1)
    assert(Set(asg(1L), asg(3L), asg(5L)).size === 1)
    assert(asg(0L) !== asg(1L))
  }

  test("assignment plan broadcasts centroids (no corpus-side shuffle join)") {
    val plan = KMeans.fit(toyPoints, "id", "v", 2, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
  }
}
