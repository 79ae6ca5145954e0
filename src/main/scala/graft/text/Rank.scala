package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 term ranking over a document corpus — the retrieval-quality
  * scoring primitive (per-doc salient terms; the same machinery scores
  * query→doc relevance when the tf table is filtered to query terms).
  *
  * Uses the rational Robertson idf (N − df + ½)/(df + ½) WITHOUT the
  * log wrap: ln is not bit-portable across engines, while this keeps
  * every operation in +,−,×,÷ IEEE arithmetic so the DuckDB oracle
  * hash-matches (same precedent as q_tfidf_top's N/df idf). Ranking
  * order differs from log-BM25 only through idf monotonicity — it is
  * order-identical per term pair.
  *
  * Scale shape: ONE corpus tokenization feeding tf (persisted), with
  * df, doc length, and corpus totals all derived from tf — no second
  * scan; the per-doc top-k is a (doc_id)-partitioned window after a
  * map-side-combined aggregation. The corpus stats join is a broadcast
  * of one row; df joins on term (the natural shuffle key).
  */
object Rank {

  /** Per-doc top-k BM25 terms with k1/b defaults (1.2, 0.75).
    * Output: (doc_id, term, score, rnk), rnk 1..k per doc.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .persist()
    // df: tf is distinct per (doc, term) → count per term == doc freq.
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // Doc length + corpus averages, all from tf (no re-tokenization).
    val dl = tf.groupBy("doc_id")
      .agg(sum(col("tf")).cast(DoubleType).as("dl"))
    val stats = dl.agg(count(lit(1)).cast(DoubleType).as("nd"),
      (sum(col("dl").cast(LongType)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("avgdl"))
    val scored = tf.join(df, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("nd") - col("df").cast(DoubleType) + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5)))
      .withColumn("score",
        col("idf") * (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score"),
        col("rnk").cast(LongType).as("rnk"))
  }
}
