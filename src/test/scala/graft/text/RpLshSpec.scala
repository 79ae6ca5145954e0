package graft.text

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Recall property for the random-hyperplane sign-LSH variant
  * (VERDICT r04 #3): on ANISOTROPIC data — where the leading
  * dimensions carry no signal — axis-aligned sign buckets are noise
  * while dense seeded projections follow the data's dominant
  * directions, so [[Similarity.rpBucketedTopK]] must recover what
  * [[Similarity.bucketedTopK]] loses. Everything is seeded, so the
  * measured recalls are deterministic regression pins, not
  * probabilistic gambles.
  */
class RpLshSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val bits = 8
  private val k = 5

  /** 10 clusters × 6 near-identical members. Dims 1-8 are ±0.005
    * noise (what the axis-aligned bucketer sees — pure coin flips);
    * dims 9-16 are the shared cluster signal (~N(0,1), identical
    * across members). Ground truth for each query (member 0 of each
    * cluster) is its 5 co-members at cosine ≈ 1.
    */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 10).flatMap { cl =>
      val signal = Array.fill(8)(rnd.nextGaussian())
      (0 until 6).map { m =>
        val noise = Array.fill(8)((rnd.nextDouble() - 0.5) * 0.01)
        (cl * 10L + m, (noise ++ signal).map(_.toFloat).toSeq)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus.filter($"vec_id" % 10 === 0)

  private lazy val exact = Similarity
    .bruteForceTopK(corpus, queries, "vec_id", "embedding", k, dim)
    .select("query_id", "nbr_id")
    .cache()

  private def recall(approx: DataFrame): Double = {
    val total = exact.count().toDouble
    val hits = exact
      .join(approx.select("query_id", "nbr_id"),
        Seq("query_id", "nbr_id"), "left_semi")
      .count()
    hits / total
  }

  test("random-projection buckets recover the recall axis-aligned " +
    "buckets lose on anisotropic data") {
    val axis = recall(Similarity.bucketedTopK(
      corpus, queries, "vec_id", "embedding", k, bits, dim))
    val rp = recall(Similarity.rpBucketedTopK(
      corpus, queries, "vec_id", "embedding", k, bits, dim, seed = 42L))
    // axis buckets hash the ±0.005 noise dims: co-members co-bucket
    // with prob ~2^-8, so recall collapses; dense projections are
    // dominated by the 8 signal dims the noise can barely perturb.
    assert(axis <= 0.3, f"axis-aligned recall $axis%.2f unexpectedly " +
      "high — the anisotropic fixture no longer isolates the failure")
    assert(rp >= 0.9, f"random-projection recall $rp%.2f below 0.9")
    assert(rp >= axis + 0.5,
      f"rp recall $rp%.2f does not dominate axis recall $axis%.2f")
  }

  // NOTE deliberately NOT asserted: "rp recall >= axis-aligned on the
  // real embeddings table". The synthetic embeddings are isotropic
  // random vectors, where theory says the two bucketers are equivalent
  // in expectation — measured recalls there are both at the noise
  // floor (1-2 hits / 100 at bits=8, single-probe) and an inequality
  // between them is a coin flip, not a property. The anisotropic
  // fixture above is the honest discriminator.

  test("rpBucket is deterministic: same seed, same buckets, " +
    "run-to-run identical results") {
    def run() = Similarity.rpBucketedTopK(
        corpus, queries, "vec_id", "embedding", k, bits, dim, seed = 1L)
      .orderBy("query_id", "rnk")
      .collect().toSeq
    assert(run() == run())
  }
}
