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
    *
    * Only vertices incident to an edge can ever receive a label other
    * than their own id, so the fixpoint loop runs on the edge-touched
    * subgraph alone; isolated vertices re-enter as singletons in one
    * final anti-join. In a near-dup corpus the touched set is a small
    * fraction of the vertex set — at 100 TB this is the difference
    * between shuffling the dup subgraph per iteration and shuffling
    * every document per iteration.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          edgesPerPartition: Long = 1000000L): DataFrame = {
    val symRaw = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // The fixpoint loop runs at a parallelism sized to the SUBGRAPH,
    // not the corpus: near-dup edge lists are orders of magnitude
    // smaller than the input, and iterating a tiny graph across
    // corpus-scale shuffle partitions pays per-task overhead ×
    // iterations for nothing. One count sizes it (~16 MB of longs per
    // partition); hash-partitioning `sym` on src once lets every
    // iteration's join reuse the cached layout and shuffle only the
    // label side.
    // Cache BEFORE the sizing count: edge production (e.g. the n-gram
    // posting join upstream) is the expensive part, and an uncached
    // symRaw would re-run it to fill the repartitioned cache below.
    val symC = symRaw.cache()
    val nEdges = symC.count()
    val parts = math.max(1L, math.min(
      edges.sparkSession.sparkContext.defaultParallelism.toLong,
      nEdges / edgesPerPartition + 1L)).toInt
    val sym = symC.repartition(parts, col("src")).cache()
    // `sym` holds both orientations, so src alone covers every endpoint.
    val touched = sym.select(col("src").as("id")).distinct()
    var labels = touched.select(col("id"), col("id").as("component"))
      .cache()
    // Labels only ever decrease (min-propagation), so Σcomponent
    // strictly decreases until the fixpoint — convergence is one cheap
    // aggregate per iteration, no join-with-previous needed.
    // coalesce: an edge-free graph leaves the touched set empty and
    // SUM over zero rows is NULL.
    var prevSum = labels.agg(coalesce(sum("component"), lit(0L)))
      .collect()(0).getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for dst = component of src; keep the min of
      // (own component, best neighbor candidate)
      // shuffle_hash hint: labels' cached node-sized estimate would
      // otherwise auto-broadcast it every iteration — wrong at 50M+
      // nodes. SHJ keeps the intended plan: sym's hash layout reused
      // sort-free, only the label side shuffles.
      val candidates = sym.join(labels.hint("shuffle_hash"),
          sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      // Explicit repartition pins the aggregation to the subgraph-sized
      // partition count (the session-wide shuffle.partitions knob is
      // sized for the corpus); groupBy reuses the layout, so this is
      // still exactly one exchange per iteration.
      val next = labels.unionByName(candidates)
        .repartition(parts, col("id"))
        .groupBy("id").agg(min("component").as("component"))
        .cache()
      val newSum = next.agg(coalesce(sum("component"), lit(0L)))
        .collect()(0).getLong(0)
      labels.unpersist()
      labels = next
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
    }
    val isolated = vertices.select(col("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    val out = labels.unionByName(isolated)
    symC.unpersist()
    sym.unpersist()
    out
  }

  /** Dedup clustering end-to-end: near-dup pairs (exact n-gram Jaccard)
    * → connected components → (doc_id, component, is_canonical).
    */
  def dedupClusters(docs: DataFrame, textCol: String, idCol: String,
                    n: Int, minJaccard: Double): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, textCol, idCol, n,
      minJaccard)
    // Persisted, like the signature tables in Dedup: the edge list is
    // tiny next to the corpus, feeds the sizing count plus every
    // fixpoint iteration, and the posting self-join that produces it is
    // the expensive stage — never recompute it.
    val edges = pairs.select(col("doc_a").as("src"),
      col("doc_b").as("dst")).persist()
    val vertices = docs.select(col(idCol).as("id"))
    connectedComponents(vertices, edges)
      .withColumn("is_canonical", (col("id") === col("component"))
        .cast("boolean"))
      .select(col("id").as("doc_id"), col("component"),
        col("is_canonical"))
  }

  // Materialized clustering, keyed by (input plan, params). A dedup
  // clustering is consumed by several downstream reports (the cluster
  // listing, survivor selection, drop audits …) — in a production
  // pipeline it is computed ONCE, written out, and shared, not
  // re-derived per consumer. Parquet (not .persist) is deliberate:
  // the fixpoint loop's result drags a deep nested-cache lineage that
  // Spark re-plans on every reuse; writing truncates it to a plain
  // scan of a tiny table, which is also exactly what a 100 TB pipeline
  // does with its clustering artifact. (The INPUT plan is the key —
  // the loop runs eager sizing/convergence jobs during construction,
  // so [[graft.ops.Materialize]]'s output-plan keying would re-run
  // them per consumer.)
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, String]()

  /** [[dedupClusters]] through a process-wide materialization cache:
    * the first consumer computes the assignment and writes it to a
    * temp parquet; every consumer (same input, same params) reads the
    * written artifact.
    */
  def materializedClusters(docs: DataFrame, textCol: String, idCol: String,
                           n: Int, minJaccard: Double): DataFrame = {
    val spark = docs.sparkSession
    val key = Seq(docs.queryExecution.analyzed.canonicalized.toString,
      textCol, idCol, n, minJaccard).mkString("|")
    val path = memo.computeIfAbsent(key, { _ =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_clusters").toString
      dedupClusters(docs, textCol, idCol, n, minJaccard)
        .write.mode("overwrite").parquet(dir)
      dir
    })
    spark.read.parquet(path)
  }
}
