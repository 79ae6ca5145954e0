package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q_embed_pairs_lsh_auto is rows-only (its bucket width depends on a
  * runtime count the literal SQL oracle can't mirror), so this spec
  * carries its correctness: exact precision by construction, a recall
  * floor vs the exact cosine pair set, and the sizing invariant.
  */
class LshAutoSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("adaptive-bits LSH pairs: precision 1.0 vs exact cosine pairs, " +
      "recall above the single-table sign-LSH floor") {
    val emb = graft.io.Tables.table(spark, dir, "embeddings")
    val auto = graft.Queries.queries("q_embed_pairs_lsh_auto")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Similarity
      .cosinePairs(emb, "vec_id", "embedding", minCosine = 0.3, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision: bucketing can only DROP candidate pairs; every
    // reported pair carries an exactly-computed cosine >= threshold
    assert(auto.subsetOf(exact),
      s"reported pairs outside the exact set: ${auto.diff(exact).take(5)}")
    // recall: a single sign-LSH table keeps pairs landing in one
    // bucket; on unit vectors at cosine >= 0.3 that retains a solid
    // fraction — pin a floor so bucket-sizing regressions surface
    val recall =
      if (exact.isEmpty) 1.0 else auto.size.toDouble / exact.size
    assert(recall >= 0.25, s"recall $recall < 0.25 floor " +
      s"(${auto.size}/${exact.size})")
  }

  test("sizing invariant: reported pairs match bitsFor(n) bucketing " +
      "exactly (the registered query IS the sized operator)") {
    val emb = graft.io.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    val expected = Similarity.bucketedPairs(emb, "vec_id", "embedding",
        minCosine = 0.3, bits = Similarity.bitsFor(n), dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = graft.Queries.queries("q_embed_pairs_lsh_auto")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == expected)
  }
}
