package graft.text

import graft.SparkSpec

class PQSpec extends SparkSpec {
  import spark.implicits._

  // ids 0,1 are the codebook (k=2); 2 duplicates 0, 3 duplicates 1
  // except in the second subspace, where it copies 0.
  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 1f)),
    (1L, Array(-1f, 0f, 0f, -1f)),
    (2L, Array(1f, 0f, 0f, 1f)),
    (3L, Array(-1f, 0f, 0f, 1f))
  ).toDF("vec_id", "v")

  test("pqEncode maps codebook members to themselves with distance 0") {
    val out = PQ.pqEncode(vecs, "vec_id", "v", k = 2, m = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // codebook rows: exact self-match in every subspace
    for (id <- Seq(0L, 1L); s <- Seq(0L, 1L))
      assert(out((id, s)) === (id, 0L), s"id=$id sub=$s")
    // 2 == vector 0 everywhere; 3 mixes codes across subspaces
    assert(out((2L, 0L)) === (0L, 0L))
    assert(out((2L, 1L)) === (0L, 0L))
    assert(out((3L, 0L)) === (1L, 0L))
    assert(out((3L, 1L)) === (0L, 0L))
  }

  test("adcTopK ranks the exact-duplicate vector first with distance 0") {
    val codes = PQ.pqEncode(vecs, "vec_id", "v", k = 2, m = 2, dim = 4)
    val out = PQ.adcTopK(codes, vecs.filter($"vec_id" === 2L), vecs,
        "vec_id", "v", k = 2, m = 2, dim = 4, topN = 3)
      .orderBy("rnk").collect()
    // query 2 duplicates vector 0 → code-identical → ADC distance 0
    assert(out.head.getLong(1) === 0L)
    assert(out.head.getLong(2) === 0L)
    // every reported distance is a sum of per-subspace exact distances
    assert(out.forall(_.getLong(2) >= 0L))
  }
}
