package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Media.syntheticFromDocuments(
    graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents"))

  test("synthetic media table matches the declared schema") {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(shape(media.schema) == shape(Media.mediaSchema))
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic, batched, fixed-dim") {
    val f1 = Media.extractFeatures(media, Media.StubCodec, dim = 8,
      batchSize = 7)
    val f2 = Media.extractFeatures(media.repartition(5), Media.StubCodec,
      dim = 8, batchSize = 64)
    assert(f1.count() == media.count())
    assert(f1.filter(size($"features") =!= 8).count() == 0)
    // same features regardless of partitioning/batch size
    assert(f1.exceptAll(f2).isEmpty && f2.exceptAll(f1).isEmpty)
  }

  test("resize rewrites image meta dims and bytes, leaves others alone") {
    val out = Media.resizeImages(media, Media.StubCodec, 224, 224)
    val img = out.filter($"kind" === "image")
      .select($"meta.width", $"meta.height").distinct()
      .as[(Int, Int)].collect().toSeq
    assert(img == Seq((224, 224)))
    val audio = out.filter($"kind" === "audio")
      .join(media.filter($"kind" === "audio")
        .select($"media_id", $"bytes".as("orig")), "media_id")
      .filter($"bytes" =!= $"orig")
    assert(audio.count() == 0)
  }

  test("frame sampling emits duration/every + 1 rows per video") {
    val frames = Media.sampleFrames(media, everyMs = 1000L)
    val expected = media.filter($"kind" === "video")
      .select(sum(($"meta.duration_ms" / 1000).cast("long") + 1))
      .as[Long].head()
    assert(frames.count() == expected)
    val bad = frames.filter($"frame_ts_ms" % 1000 =!= 0 ||
      $"frame_ts_ms" < 0)
    assert(bad.count() == 0)
  }

  test("byteFrameStats: exact frame split, hand-checked stats, empty " +
    "bytes emit no frames, exact-multiple lengths have no short frame") {
    // "abc" = 97,98,99; " " = 32; 4-byte frames over known payloads
    val fixture = Seq(
      (1L, "image", "abc abc!".getBytes("UTF-8")), // 8 = 2 full frames
      (2L, "audio", "xyz".getBytes("UTF-8")),      // 1 short frame
      (3L, "video", Array.emptyByteArray)          // no frames
    ).toDF("media_id", "kind", "bytes")
    val out = Media.byteFrameStats(fixture, frameBytes = 4)
      .orderBy("media_id", "frame_idx")
      .as[(Long, String, Long, Long, Long, Int, Int, Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, "image", 0L, 4L, 97L + 98L + 99L + 32L, 32, 99, 1L),
      (1L, "image", 1L, 4L, 97L + 98L + 99L + 33L, 33, 99, 0L),
      (2L, "audio", 0L, 3L, 120L + 121L + 122L, 120, 122, 0L)),
      s"unexpected frame stats: $out")
  }

  test("repartitionBySize yields size-proportional partition count") {
    val out = Media.repartitionBySize(media, targetBytes = 10000L)
    val total = media.agg(sum(octet_length($"bytes"))).as[Long].head()
    assert(out.rdd.getNumPartitions == math.max(1, (total / 10000L).toInt))
  }
}
