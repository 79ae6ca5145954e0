package graft.text

import graft.SparkSpec

class RankSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat"),
    (2L, "the dog ran far away today"),
    (3L, "the cat ran")
  ).toDF("doc_id", "text")

  test("bm25 ranks rare terms above ubiquitous ones") {
    val out = Rank.bm25TopK(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id", "rnk").collect()
    // every doc gets exactly its top-3 (all docs have >= 3 terms)
    assert(out.count(_.getAs[Long]("doc_id") == 1L) === 3)
    // 'the' occurs in every doc -> minimal idf -> never rank 1
    assert(!out.exists(r =>
      r.getAs[String]("term") == "the" && r.getAs[Long]("rnk") == 1L))
    // doc 1's top term is one of its two unique-ish terms, not 'the'
    val d1top = out.find(r =>
      r.getAs[Long]("doc_id") == 1L && r.getAs[Long]("rnk") == 1L).get
    assert(Set("cat", "sat").contains(d1top.getAs[String]("term")))
  }

  test("bm25 length normalization: same tf scores higher in shorter doc") {
    val two = Seq(
      (1L, "alpha beta"),
      (2L, "alpha gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val s = Rank.bm25TopK(two, "doc_id", "text", k = 7)
      .filter($"term" === "alpha")
      .orderBy("doc_id").collect()
    assert(s.length === 2)
    assert(s(0).getAs[Double]("score") > s(1).getAs[Double]("score"))
  }
}
