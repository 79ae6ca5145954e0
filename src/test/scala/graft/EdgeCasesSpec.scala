package graft

import org.apache.spark.sql.functions._

import graft.text.{Dedup, TextOps}

/** Edge-case pins: empty inputs, degenerate docs, zero-duration media —
  * the inputs a 100 TB corpus is guaranteed to contain somewhere.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("stratified hash sampling: deterministic, 1000‰ keeps all, " +
      "absent stratum samples at 0") {
    val df = (1L to 400L).map(i =>
        (i, if (i % 2 == 0) "a" else if (i % 3 == 0) "b" else "c"))
      .toDF("id", "stratum")
    def run() = graft.ops.Relational.sampleStratifiedHash(df, "id",
        "stratum", Map("a" -> 1000, "b" -> 250), seed = 7L)
      .select("id").as[Long].collect().toSet
    val s1 = run()
    assert(s1 == run()) // pure function of (id, stratum, seed)
    val byStratum = df.as[(Long, String)].collect().groupBy(_._2)
    assert(byStratum("a").map(_._1).toSet.subsetOf(s1)) // 1000‰ = all
    assert(!s1.exists(byStratum("c").map(_._1).toSet)) // absent = none
    val bKept = s1.intersect(byStratum("b").map(_._1).toSet)
    assert(bKept.nonEmpty && bKept.size < byStratum("b").length)
  }

  test("normalize handles empty, punctuation-only, and multi-space") {
    val df = Seq((1L, ""), (2L, "!!! ??"), (3L, "  A  b,C  "))
      .toDF("id", "t")
    val out = df.select($"id", TextOps.normalize($"t").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "", 2L -> "", 3L -> "a bc"))
  }

  test("ngram pairs on an empty or all-short corpus is empty, not a " +
      "failure") {
    val df = Seq((1L, "a"), (2L, "b c")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.5)
      .count() == 0)
    val empty = spark.emptyDataset[(Long, String)]
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(empty, "text", "doc_id", 2, 0.5)
      .count() == 0)
  }

  test("minhash skips empty shingle sets without erroring") {
    val df = Seq((1L, "x"), (2L, "a b c d e f"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(df, "text", "doc_id", 2, 32, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 3L)))
  }

  test("frame sampling of a zero-duration video yields exactly one " +
      "frame at t=0") {
    val media = Seq((1L, "video", Array[Byte](1),
        ("m", 1, 1, 1, 0L)))
      .toDF("media_id", "kind", "bytes", "meta")
      .withColumn("meta", struct(
        col("meta._1").as("mime"), col("meta._2").as("width"),
        col("meta._3").as("height"), col("meta._4").as("sample_rate"),
        col("meta._5").cast("long").as("duration_ms")))
    val frames = graft.multimodal.Media.sampleFrames(media, 1000L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(frames == Seq((1L, 0L, 0L)))
  }

  test("chunk/skipgram/contamination ops stay empty-safe on degenerate " +
      "docs") {
    val degenerate = Seq((1L, "solo"), (2L, "two words"))
      .toDF("doc_id", "text")
    // chunkDocs: every doc shorter than `size` yields exactly one chunk
    val chunks = TextOps.chunkDocs(degenerate, "text", "doc_id", 32, 24)
      .as[(Long, Long, String, Long)].collect().toList.sortBy(_._1)
    assert(chunks == List((1L, 0L, "solo", 1L), (2L, 0L, "two words", 2L)))
    // skipgrams: single-token doc emits nothing; two tokens emit both
    // orientations at offset 1, nothing at offset 2
    val pairs = degenerate
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .select($"doc_id",
        explode(TextOps.skipgramPairs($"toks", 2)).as("p"))
      .select($"doc_id", $"p.w", $"p.c")
      .as[(Long, String, String)].collect().toSet
    assert(pairs == Set((2L, "two", "words"), (2L, "words", "two")))
    // contamination with an empty probe side is empty, not a crash
    val none = Dedup.crossOverlapPairs(
      degenerate.filter($"doc_id" < 0), degenerate,
      "text", "doc_id", n = 3, minShared = 1L)
    assert(none.count() == 0)
  }

  test("intervalJoin with point intervals joins only exact instants") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val a = Seq((1L, ts0, ts0)).toDF("aid", "st_a", "en_a")
    val b = Seq((10L, ts0, ts0), (11L, ts1, ts1))
      .toDF("bid", "st_b", "en_b")
    val out = graft.ops.Relational.intervalJoin(a, b,
        "st_a", "en_a", "st_b", "en_b", bucketSeconds = 3600L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)))
  }

  test("profile counts nulls out of n_nonnull") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "a"))
      .toDF("k", "v")
    val m = graft.ops.Relational.profile(df, Seq("k", "v"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m == Map("k" -> ((2L, 2L)), "v" -> ((3L, 2L))))
  }
}
