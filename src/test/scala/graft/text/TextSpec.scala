package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.io.Tables
    .table(spark, "/root/testdata/sf0.001", "documents")

  test("shingles: shorter-than-n doc yields empty set; distinct applied") {
    val df = Seq((1L, "a b"), (2L, "a b a b"), (3L, "x")).toDF("id", "t")
    val out = df.select($"id",
      TextOps.shingles(TextOps.tokens($"t"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).isEmpty && out(3L).isEmpty)
    assert(out(2L) == Seq("a b a", "b a b"))
    val bi = df.select(TextOps.shingles(TextOps.tokens($"t"), 2).as("sh"))
      .where($"id" === 2).as[Seq[String]].head()
    assert(bi.sorted == Seq("a b", "b a")) // "a b" appears twice → once
  }

  test("exact dedup groups duplicate texts under min id survivor") {
    val df = Seq((5L, "same text"), (2L, "same text"), (9L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 2L), (9L, 1L)))
  }

  test("minhash pairs are a subset of exact ngram pairs at same threshold" +
      " and recall the planted near-dups") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(docs, "text", "doc_id", 2, 64, 16, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(exact))
    // High-jaccard pairs collide in >=1 of 16 bands w.p. ~1-2e-4 each:
    val planted = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(planted.nonEmpty && planted.subsetOf(mh))
  }

  test("simhash: identical docs at distance 0; near-dups close") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely different words appear here tonight"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "text", "doc_id", 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._3 > 3))
  }

  test("fingerprint stays within the modulus and is order-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp.values.forall(v => v >= 0 && v < 2147483647L))
    assert(fp(1L) != fp(2L))
  }

  test("langId votes marker stopwords with first-wins tiebreak") {
    val df = Seq((1L, "the cat and the dog"), (2L, "der hund ist nicht"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextOps.langId(df, "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("quality metrics on a known doc") {
    val df = Seq((1L, "the the fox")).toDF("doc_id", "text")
    val r = TextOps.qualityMetrics(df, "text")
      .select("n_tokens", "n_distinct", "ttr", "stopword_ratio")
      .as[(Long, Long, Double, Double)].head()
    assert(r == ((3L, 2L, 2.0 / 3.0, 2.0 / 3.0)))
  }

  test("brute-force cosine top-k ranks an identical vector first") {
    val df = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(1f, 0f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(0.9f, 0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df,
        df.filter($"vec_id" === 1), "vec_id", "embedding", 2, dim = 3)
      .orderBy("rnk").select("nbr_id").as[Long].collect().toSeq
    assert(top == Seq(2L, 4L))
  }

  test("bucketed top-k only pairs vectors sharing the sign bucket") {
    val df = Seq(
      (1L, Seq(1f, 1f, 1f, 1f)), (2L, Seq(1f, 1f, 1f, 1f)),
      (3L, Seq(-1f, -1f, -1f, -1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bucketedTopK(df, df, "vec_id", "embedding", 5, 4, dim = 4)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (2L, 1L))) // 3 is alone in its bucket
  }
}
