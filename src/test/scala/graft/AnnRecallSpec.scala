package graft

import org.apache.spark.sql.functions._

import graft.text.Similarity

/** Quality floor for the IVF ANN index (VERDICT r04 #2): q_ann_recall
  * REPORTS recall@5 per query but nothing in a report asserts it — an
  * index-quality regression (bad centroids, broken cell assignment,
  * wrong probe join) would pass silently. These bounds pin the
  * measured, deterministic values at sf0.001 with nlist=16, nprobe=4.
  *
  * Two paths, two tests (r18, VERDICT r17 item 8): the REGISTERED
  * query now runs the seeded quantizer (ivfTopKSeeded — exact-integer,
  * oracle-checked), while the MLlib-TRAINED quantizer remains the
  * production path via q_similarity_ivf — its recall floor lives here
  * because no oracle can check a trained model's output.
  * SketchBoundsSpec is the precedent for bounding approximations.
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_ann_recall (seeded quantizer): recall@5 holds a 0.6 mean " +
    "floor and a 0.2 per-query floor across all 20 queries") {
    val rows = Queries.queries("q_ann_recall")(spark, dir)
      .select(col("query_id"), col("recall_at_5"))
      .collect()
    // one row per query — the left join surfaces zero-hit queries as
    // recall 0 instead of dropping them, so the per-query floor below
    // is what actually asserts "no query came back empty-handed"
    assert(rows.length == 20, s"expected 20 query rows, got ${rows.length}")
    val recalls = rows.map(_.getDouble(1))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.6, f"mean recall@5 $mean%.3f below the 0.6 floor")
    assert(recalls.forall(_ >= 0.2),
      s"some query below 0.2: ${recalls.min}")
  }

  test("trained MLlib quantizer (ivfTopK, the q_similarity_ivf path): " +
    "recall@5 holds the same 0.6 mean / 0.2 per-query floors") {
    val emb = graft.io.Tables.table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 5, dim = 64)
      .select(col("query_id"), col("nbr_id"))
    val approx = Similarity.ivfTopK(emb, queries,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
      .select(col("query_id"), col("nbr_id"))
      .withColumn("__hit", lit(1L))
    val rows = exact.join(approx, Seq("query_id", "nbr_id"), "left")
      .groupBy("query_id").agg(count(col("__hit")).as("n_hit"))
      .select(col("query_id"), (col("n_hit").cast("double") / 5.0)
        .as("recall_at_5"))
      .collect()
    assert(rows.length == 20, s"expected 20 query rows, got ${rows.length}")
    val recalls = rows.map(_.getDouble(1))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.6, f"mean recall@5 $mean%.3f below the 0.6 floor")
    assert(recalls.forall(_ >= 0.2),
      s"some query below 0.2: ${recalls.min}")
  }
}
