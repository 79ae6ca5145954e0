package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Similarity

/** Streaming near-dup serving parity: replaying a corpus through
  * [[Streams.nearDupStream]] against its own materialized signature
  * table must reproduce EXACTLY the batch LSH bucket self-join
  * ([[Similarity.bucketedPairs]], the oracle-green `q_embed_pairs_lsh`
  * plan) — same pair set after canonicalizing direction, bit-equal
  * cosines. This is the serving-side twin the batch query implies: an
  * ingest gate that flags each incoming document against the indexed
  * corpus without ever re-scoring corpus×corpus.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val bits = 6
  private val minCosine = 0.3

  test("replayed corpus through nearDupStream equals batch " +
    "bucketedPairs, bit-equal cosines, every pair seen from both sides") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val sigs = Similarity.signatures(emb, "vec_id", "embedding", bits)
      .persist()
    val want = Similarity.bucketedPairs(emb, "vec_id", "embedding",
        minCosine, bits, dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "planted corpus must produce near-dup pairs")

    val rows = emb
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streams.nearDupStream(in.toDF().toDF("vec_id", "embedding"),
        sigs, "vec_id", "embedding", minCosine, bits)
      .writeStream.format("memory").queryName("neardup").start()
    try {
      // two micro-batches: parity must not depend on batch boundaries
      val (b1, b2) = rows.splitAt(rows.size / 2)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("neardup")
      .as[(Long, Long, Double)].collect()
    // serving emits each {a,b} from both directions (a arrives → finds
    // b; b arrives → finds a): exactly 2× the batch pair count
    assert(got.length == 2 * want.size,
      s"expected each of ${want.size} pairs twice, got ${got.length}")
    val canon = got.map { case (id, dup, cos) =>
      (math.min(id, dup), math.max(id, dup), cos)
    }.toSet
    assert(canon == want, "canonicalized stream pairs != batch pairs")
    sigs.unpersist()
    ()
  }
}
