package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training over a distributed corpus — the
  * tokenizer-training operator an LLM-data pipeline runs before
  * `vocab_encode` can exist (reference analogue: the corpus feeding
  * tf.Example byte features, notebook.ipynb:194-196, is exactly what a
  * production pipeline would tokenize; the reference delegates
  * tokenization to TF, this engine trains it natively).
  *
  * Scale shape: the corpus collapses to the WORD-FREQUENCY table in one
  * aggregation (vocabulary-sized — for natural language ~10⁵-10⁶ rows
  * regardless of corpus bytes), and every merge iteration runs over
  * that cached table: adjacent-symbol-pair counts weighted by word
  * frequency, one `head()` per iteration to pick the argmax pair
  * (a model-sized driver scalar, the LinUCB/Cluster precedent — never
  * a corpus-sized collect). This is how reference BPE trainers
  * (sentencepiece, GPT-2's encoder) structure the computation; the
  * distributed twist is only that the wf table and the per-iteration
  * count ride Spark aggregations. All per-row work is native Column
  * lambdas (aggregate/transform) — codegen'd, no UDF.
  */
object Bpe {

  /** Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    * the single symbol a+b, as a codegen'd fold over the symbol array:
    * the accumulator's LAST element decides, so an element consumed by
    * a merge can't start another ("aaa" under (a,a) → ["aa","a"]).
    */
  def mergeExpr(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of an array column, as (a, b) structs. */
  private def pairsOf(syms: Column): Column =
    transform(sequence(lit(1), size(syms) - 1), i =>
      struct(element_at(syms, i).as("a"), element_at(syms, i + 1).as("b")))

  /** Corpus → word-frequency table: the ONE corpus-sized aggregation.
    * Words shorter than 2 chars carry no pairs and are dropped.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wf"))

  /** Train `nMerges` BPE merges. Returns the learned merge list in
    * order; stops early when the best pair's corpus count drops below
    * `minCount`. Ties break deterministically on (count DESC, a, b).
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 1L): Seq[(String, String)] = {
    var syms = wordFreq(docs, textCol)
      .select(col("wf"), split(col("word"), "").as("syms"))
      .persist()
    syms.count() // materialize before the loop re-reads it per iteration
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < nMerges) {
      val top = syms
        .select(col("wf"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("wf")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // argmax pair: a 1-row, model-sized scalar
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += ((a, b))
        val next = syms
          .withColumn("syms", mergeExpr(col("syms"), a, b))
          .persist()
        next.count()
        syms.unpersist()
        syms = next
      }
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Encode a token column with a learned merge list: character split,
    * then each merge applied in training order — pure per-row codegen'd
    * column expressions, no shuffle, no UDF; usable on a 100 TB corpus
    * as a projection. Output: array<string> symbol column.
    */
  def encode(tokenCol: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(tokenCol, "")) {
      case (c, (a, b)) => mergeExpr(c, a, b)
    }
}
