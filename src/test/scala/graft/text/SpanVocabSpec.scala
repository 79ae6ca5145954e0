package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the round-4 span-dedup and vocab-encode
  * operators, on constructed corpora where the right answer is known
  * exactly (the registered queries' oracle check proves engine
  * equivalence; these prove the operators mean what they claim).
  */
class SpanVocabSpec extends SparkSpec {
  import spark.implicits._

  private def runQuery(name: String, df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // Registered queries read tables by dir; for constructed corpora we
    // re-derive the same plan through a temp dir of parquet.
    val dir = java.nio.file.Files.createTempDirectory("svspec").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.Queries.queries(name)(spark, dir)
  }

  test("span_dedup: a verbatim duplicate pair scores dup_ratio 1.0 on " +
    "both copies, an unrelated doc scores 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta", "en", "a", 7L),
      (2L, "alpha beta gamma delta epsilon zeta eta", "en", "b", 7L),
      (3L, "one two three four five six seven eight", "en", "c", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = runQuery("q_span_dedup", docs)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0 && out(3L) == 0.0, out)
  }

  test("span_dedup: ratios are always within [0,1] and span counts " +
    "match token counts - 4 on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Queries.queries("q_span_dedup")(spark, dir)
      .select("doc_id", "n_spans", "n_dup_spans", "dup_ratio")
      .as[(Long, Long, Long, Double)].collect()
    val toks = graft.Q.t(spark, dir, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (id, ns, nd, r) =>
      assert(nd >= 0 && nd <= ns && r >= 0.0 && r <= 1.0, s"doc $id")
      assert(ns == math.max(toks(id) - 4, 0), s"doc $id span count")
    }
  }

  test("vocab_encode: ids decode back to the original token sequence") {
    val dir = "/root/testdata/sf0.001"
    // Rebuild the vocab exactly as the query does and invert it.
    val toks = graft.Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
    val cnt = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val id2term = graft.ops.Relational.zipIndex(cnt,
        Seq(col("cnt").desc, col("term").asc), "id0")
      .select((col("id0") + 1L).as("id"), col("term"))
      .as[(Long, String)].collect().toMap
    // Every id is contiguous 1..V and unique.
    assert(id2term.keySet == (1L to id2term.size.toLong).toSet)
    val out = graft.Queries.queries("q_vocab_encode")(spark, dir)
      .select("doc_id", "head_ids").as[(Long, String)].collect()
    val firstTokens = graft.Q.t(spark, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(TextOps.tokens(col("text")), 1, 16), " ")
          .as("head"))
      .as[(Long, String)].collect().toMap
    out.foreach { case (id, headIds) =>
      val decoded = headIds.split(",").map(s => id2term(s.toLong))
        .mkString(" ")
      assert(decoded == firstTokens(id), s"doc $id decode mismatch")
    }
  }
}
