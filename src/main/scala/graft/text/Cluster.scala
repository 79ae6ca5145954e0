package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the
  * clustering step of a dedup pipeline (pairs → groups → one canonical
  * doc per group). Min-label propagation to fixpoint: every node ends
  * labeled with the smallest doc id reachable from it, matching the
  * recursive-CTE oracle exactly.
  *
  * Scale: each iteration is one join + one aggregation on the edge
  * list (both shuffles on node id); iterations needed = graph diameter
  * (near-dup clusters are tiny cliques, so 2-3 in practice, `maxIter`
  * bounds the pathological chain). Driver holds only the convergence
  * counter, never the graph.
  */
object Cluster {

  /** @param vertices one column `id`
    * @param edges    columns `src`, `dst` (undirected, any orientation)
    * @return (id, component) with component = min id in the component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = vertices.select(col("id"), col("id").as("component"))
      .cache()
    // Labels only ever decrease (min-propagation), so Σcomponent
    // strictly decreases until the fixpoint — convergence is one cheap
    // aggregate per iteration, no join-with-previous needed.
    var prevSum = labels.agg(sum("component")).collect()(0).getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for dst = component of src; keep the min of
      // (own component, best neighbor candidate)
      val candidates = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionByName(candidates)
        .groupBy("id").agg(min("component").as("component"))
        .cache()
      val newSum = next.agg(sum("component")).collect()(0).getLong(0)
      labels.unpersist()
      labels = next
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Dedup clustering end-to-end: near-dup pairs (exact n-gram Jaccard)
    * → connected components → (doc_id, component, is_canonical).
    */
  def dedupClusters(docs: DataFrame, textCol: String, idCol: String,
                    n: Int, minJaccard: Double): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, textCol, idCol, n,
      minJaccard)
    val edges = pairs.select(col("doc_a").as("src"),
      col("doc_b").as("dst"))
    val vertices = docs.select(col(idCol).as("id"))
    connectedComponents(vertices, edges)
      .withColumn("is_canonical", (col("id") === col("component"))
        .cast("boolean"))
      .select(col("id").as("doc_id"), col("component"),
        col("is_canonical"))
  }
}
