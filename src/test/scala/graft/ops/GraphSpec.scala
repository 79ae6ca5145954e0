package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankQuant matches hand-computed quantized ranks on a triangle") {
    // 1→2, 2→3, 3→1: every node has outdeg 1, so ranks stay uniform:
    // r1 = floor(0.15e9 + 0.85 * 1e9) = 1e9 at every iteration.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRankQuant(edges, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L,
      3L -> 1000000000L))
  }

  test("pageRankQuant concentrates rank on a sink-heavy hub") {
    // star: 1..4 all point to 5; 5 points back to 1 only.
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRankQuant(edges, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // hand-unroll both iterations with the implementation's exact
    // IEEE expression (0.15*1e9 + 0.85*inflow, floored):
    def upd(inflow: Long): Long =
      math.floor(0.15 * 1.0e9 + 0.85 * inflow.toDouble).toLong
    // i1: hub 5 collects 4 full ranks; node 1 gets 5's rank; leaves 0.
    val r1_1 = upd(1000000000L)
    val r1_leaf = upd(0L)
    val r1_5 = upd(4L * 1000000000L)
    // i2: 5 receives r1 of 1..4; 1 receives r1(5); leaves still 0.
    // Rank oscillates through the hub: after round 2, node 1 (fed by
    // the hub's round-1 mass) is the maximum.
    assert(r(1L) === upd(r1_5))
    assert(r(5L) === upd(r1_1 + 3 * r1_leaf))
    assert(r(2L) === upd(0L))
    assert(r(2L) === r(3L))
    assert(r(1L) > r(5L) && r(5L) > r(2L))
  }

  test("triangleStats counts each triangle once on a hand graph") {
    // K4 minus edge (3,4): triangles {1,2,3} and {1,2,4} only.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("lo", "hi")
    val r = Graph.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_edges") === 5L)
    // degree order: deg(1)=deg(2)=3, deg(3)=deg(4)=2 → 3 ≺ 4 ≺ 1 ≺ 2;
    // oriented out-sets: 3→{1,2}, 4→{1,2}, 1→{2} ⇒ wedges (3;1,2) and
    // (4;1,2) — both close through the (1→2) edge
    assert(r.getAs[Long]("n_wedges") === 2L)
    assert(r.getAs[Long]("n_triangles") === 2L)
  }

  test("triangleStats degree orientation is invariant to hub skew " +
      "(star + one closing edge)") {
    // hub 100 connected to 1..6, plus edge (1,2): exactly one triangle
    // {1,2,100}, and the hub's fan-out must NOT appear as wedge space —
    // deg(100)=6 puts the hub LAST in the order, so every star edge
    // orients leaf→hub and the only wedge sources are leaves 1 and 2.
    val star = (1L to 6L).map(i => (i, 100L))
    val edges = (star :+ ((1L, 2L))).toDF("lo", "hi")
    val r = Graph.triangleStats(edges).collect().head
    assert(r.getAs[Long]("n_edges") === 7L)
    // out-sets: 1→{2?,100}, 2→{100}, … — deg(1)=2, deg(2)=2 so 1 ≺ 2:
    // (1,2) orients 1→2; wedge source 1 has out-set {2,100} → 1 wedge;
    // id-orientation would have given the same here, but a LOW-id hub
    // (id 0) would blow Σ outdeg² up to C(6,2)=15; degree order keeps
    // it at 1 either way:
    val lowHub = ((1L to 6L).map(i => (0L, i)) :+ ((1L, 2L)))
      .toDF("lo", "hi")
    val r2 = Graph.triangleStats(lowHub).collect().head
    assert(r.getAs[Long]("n_wedges") === 1L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r2.getAs[Long]("n_wedges") === 1L)
    assert(r2.getAs[Long]("n_triangles") === 1L)
  }

  test("coOccurrenceEdges keeps only pairs above the mean overlap") {
    // items 1,2 share ctx {10,20,30}; 1,3 and 2,3 share only {10}:
    // mean shared = (3+1+1)/3 -> only (1,2) is an above-mean edge.
    val pairs = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L)
    ).toDF("c", "i")
    val e = Graph.coOccurrenceEdges(pairs, "c", "i", meanFactor = 1.0)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(e === Set((1L, 2L)))
  }
}
