package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed graph scoring — PageRank as the corpus-curation quality
  * signal (rank web domains / documents by link authority, the classic
  * pre-filter for crawl corpora).
  *
  * Determinism scheme: ranks live as BIGINT scaled by 1e9. Per
  * iteration each node sends `rank div outdeg` (exact integer floor
  * division) along its edges; inflows are exact integer sums
  * (order-free), and the damping update
  * `floor(0.15·1e9 + 0.85·inflow)` is two IEEE multiplies, one add and
  * a floor over identical integers — bit-equal across engines, so the
  * unrolled oracle SQL hash-matches.
  *
  * Scale shape: edges are the big table — persisted once, shuffled on
  * `src` by the join; ranks (one row per node) re-shuffle each
  * iteration; the groupBy(dst) sum is map-side combined. No driver
  * state at all (the loop is a fixed unroll of DataFrame ops; nothing
  * is collected). This is the standard Pregel-as-join layout.
  */
object Graph {

  private val Scale = 1000000000L

  /** `iters` rounds of quantized PageRank over a directed edge list
    * (src, dst). Returns (node_id, rank_q) for every node with an
    * outgoing edge. Damping fixed at 0.85.
    */
  def pageRankQuant(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src").cast(LongType),
      col("dst").cast(LongType)).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val withDeg = e.join(deg, "src").persist()
    val nodes = e.select(col("src").as("id")).distinct().persist()
    var ranks = nodes.select(col("id"), lit(Scale).as("r"))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div d").as("contrib"))
        .groupBy("id").agg(sum(col("contrib")).as("inflow"))
      ranks = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          floor(lit(0.15) * lit(1.0e9) + lit(0.85) *
            coalesce(col("inflow"), lit(0L)).cast(DoubleType))
            .cast(LongType).as("r"))
    }
    ranks.select(col("id").as("node_id"), col("r").as("rank_q"))
  }

  /** The bipartite customer↔supplier trade graph from orders⋈lineitem,
    * both edge directions (so no dangling nodes). Supplier ids are
    * offset by 1e6 into the shared node-id space.
    */
  def tradeGraph(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    pairs.select(col("c").as("src"), (lit(1000000L) + col("s")).as("dst"))
      .unionAll(pairs.select((lit(1000000L) + col("s")).as("src"),
        col("c").as("dst")))
  }
}
