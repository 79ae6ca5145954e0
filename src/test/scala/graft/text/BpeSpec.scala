package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val Docs = "/root/testdata/sf0.001"

  test("mergeExpr is greedy left-to-right non-overlapping") {
    val df = Seq(Tuple1("aaa"), Tuple1("banana")).toDF("w")
      .select(col("w"), split(col("w"), "").as("syms"))
    val out = df
      .select(col("w"), Bpe.mergeExpr(col("syms"), "a", "a").as("m"))
      .as[(String, Seq[String])].collect().toMap
    // "aaa": first two merge, the consumed middle 'a' cannot re-merge
    assert(out("aaa") == Seq("aa", "a"))
    assert(out("banana") == Seq("b", "a", "n", "a", "n", "a"))
    val an = df.filter($"w" === "banana")
      .select(Bpe.mergeExpr(col("syms"), "a", "n").as("m"))
      .as[Seq[String]].head()
    assert(an == Seq("b", "an", "an", "a"))
  }

  test("merged symbols compare as whole symbols, not prefixes") {
    // after (a,n)->"an" gives ["an","an","a"], the ("an","a") merge
    // must match the MERGED symbol "an" as a whole — the first pair
    // (an,an) must not fire, the second (an,a) must
    val df = Seq(Tuple1("anana")).toDF("w")
      .select(split(col("w"), "").as("syms"))
      .select(Bpe.mergeExpr(col("syms"), "a", "n").as("syms"))
      .select(Bpe.mergeExpr(col("syms"), "an", "a").as("syms"))
    assert(df.as[Seq[String]].head() == Seq("an", "ana"))
  }

  test("trainMerges on the real corpus: deterministic, first merge is " +
      "the corpus-weighted argmax pair, encode is lossless") {
    val docs = graft.io.Tables.table(spark, Docs, "documents")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 8)
    assert(merges.size == 8)
    assert(Bpe.trainMerges(docs, "text", nMerges = 8) == merges,
      "training is not deterministic")
    // first merge = argmax of the corpus-weighted adjacent-pair counts
    // (the exact statistic q_bpe_pairs surfaces)
    val top = Bpe.wordFreq(docs, "text")
      .select(col("wf"), explode(expr(
        "transform(sequence(1, length(word) - 1)," +
          " i -> substring(word, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum(col("wf")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(1).as[(String, Long)].head()
    assert(merges.head._1 + merges.head._2 == top._1,
      s"first merge ${merges.head} != corpus argmax ${top._1}")
    // encode: lossless (concat restores the word) and strictly shorter
    // than the character split wherever a merge applies
    val enc = Bpe.wordFreq(docs, "text")
      .select(col("word"), Bpe.encode(col("word"), merges).as("syms"))
    val broken = enc.filter(
      concat_ws("", col("syms")) =!= col("word")).count()
    assert(broken == 0, "encode lost characters")
    val shortened = enc
      .filter(size(col("syms")) < length(col("word"))).count()
    assert(shortened > 0, "no word got shorter — merges never applied")
  }
}
