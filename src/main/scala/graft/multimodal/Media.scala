package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for LLM-data pipelines (north_star surface):
  * image/audio/video travel as opaque BINARY columns with a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as batched partition-local transforms.
  *
  * The actual codecs (JPEG decode, audio resample, video demux) are
  * STUBBED — this container has no image/audio libraries — behind
  * [[Codec]], with a deterministic fake implementation. Everything
  * Spark-side is real: schemas, binary handling, batch iteration shape,
  * partition sizing, explode fan-out. Swapping in a real codec is a
  * one-object change.
  *
  * 100 TB design: media bytes never shuffle except where the operator
  * semantically requires it — decode/resize/sample are narrow
  * (partition-local) maps; [[repartitionBySize]] rebalances ONCE up
  * front so a skewed mix of 1 KB thumbnails and 1 GB videos doesn't
  * stall stragglers; feature outputs (small arrays) are what flows into
  * downstream joins, not the raw bytes.
  */
object Media {

  /** Typed metadata carried alongside the opaque bytes. */
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),       // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", metaType)))

  /** Pluggable codec boundary. Real implementations decode actual
    * containers; [[StubCodec]] fakes it deterministically from bytes so
    * the pipeline is testable end-to-end without media libraries.
    */
  trait Codec extends Serializable {
    /** bytes → fixed-size feature vector (e.g. pooled embedding). */
    def decodeFeatures(kind: String, bytes: Array[Byte],
                       dim: Int): Array[Float]
    /** bytes → re-encoded bytes at the target size (images). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic fake: features are a seeded hash-fold of the bytes —
    * stable across runs/partitionings, shaped like a real embedding.
    * A production deployment replaces this object; nothing else changes.
    */
  object StubCodec extends Codec {
    def decodeFeatures(kind: String, bytes: Array[Byte],
                       dim: Int): Array[Float] = {
      val out = Array.ofDim[Float](dim)
      var h = 1125899906842597L ^ kind.hashCode.toLong
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 40).toInt.toFloat / (1 << 23)) - 1.0f
        i += 1
      }
      out
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      // fake re-encode: truncate/pad to w*h/64 "compressed" bytes, tagged
      java.util.Arrays.copyOf(bytes, math.max(4, w * h / 64))
  }

  /** Build a deterministic media table from the documents testdata —
    * bytes are the utf8 text, kind/meta derived from doc_id. Stands in
    * for a binary-file source so every op has reproducible input.
    */
  def syntheticFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(col("doc_id"), lit(64)) * 16 + 64).cast(IntegerType)
          .as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 64).cast(IntegerType)
          .as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 40).cast(LongType).as("duration_ms"))
        .as("meta"))

  /** Batched feature extraction: partition-local, iterator-in/
    * iterator-out with an explicit batch size (the batch shape a
    * vectorized UDF would see). Output: (media_id, kind, features).
    */
  def extractFeatures(media: DataFrame, codec: Codec, dim: Int,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "kind", "bytes")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real codecs amortize model/buffer setup across the batch
          batch.map { r =>
            Row(r.getLong(0), r.getString(1),
              codec.decodeFeatures(r.getString(1),
                r.getAs[Array[Byte]](2), dim).toSeq)
          }
        }
      }(enc)
  }

  /** Byte-level frame statistics over the opaque binary column: split
    * each media item's bytes into fixed `frameBytes` frames and emit
    * per-frame (length, unsigned-sum checksum, min/max byte, space
    * count). Unlike [[StubCodec]] features this reads the REAL bytes —
    * it is the deterministic, cross-engine-checkable slice of the
    * decode path (the synthetic media bytes are utf8 text, so a SQL
    * oracle can reproduce every stat from character codes), while
    * keeping exactly the partition-local batched-extraction plan shape
    * a production codec runs in.
    *
    * Scale: narrow map, no shuffle; output rows ≈ total_bytes /
    * frameBytes, each a fixed-width record — the raw bytes never leave
    * the scan partition.
    */
  def byteFrameStats(media: DataFrame, frameBytes: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("kind", StringType),
      StructField("frame_idx", LongType),
      StructField("n_bytes", LongType),
      StructField("checksum", LongType),
      StructField("lo", IntegerType),
      StructField("hi", IntegerType),
      StructField("n_space", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "kind", "bytes").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val b = r.getAs[Array[Byte]](2)
        val nFrames = (b.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.map { f =>
          var i = f * frameBytes
          val end = math.min(b.length, i + frameBytes)
          val n = end - i
          var sum = 0L; var lo = 256; var hi = -1; var ws = 0L
          while (i < end) {
            val v = b(i) & 0xff
            sum += v
            if (v < lo) lo = v
            if (v > hi) hi = v
            if (v == 32) ws += 1
            i += 1
          }
          Row(id, kind, f.toLong, n.toLong, sum, lo, hi, ws)
        }
      }
    }(enc)
  }

  /** Image resize: narrow map re-encoding bytes + rewriting meta dims. */
  def resizeImages(media: DataFrame, codec: Codec, w: Int,
                   h: Int): DataFrame = {
    val resizeUdf = udf((b: Array[Byte]) => codec.resize(b, w, h))
    media.withColumn("bytes",
        when(col("kind") === "image", resizeUdf(col("bytes")))
          .otherwise(col("bytes")))
      .withColumn("meta", struct(
        col("meta.mime").as("mime"),
        when(col("kind") === "image", lit(w)).otherwise(col("meta.width"))
          .as("width"),
        when(col("kind") === "image", lit(h))
          .otherwise(col("meta.height")).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms")))
  }

  /** Video frame sampling: one output row per sampled timestamp —
    * declarative explode over a generated sequence (codegen'd, no UDF);
    * the per-frame bytes decode is the stubbed step.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0L), col("meta.duration_ms"),
          lit(everyMs))).as(Seq("frame_idx", "frame_ts_ms")))
      .select(col("media_id"), col("frame_idx").cast(LongType),
        col("frame_ts_ms"))

  /** Rebalance partitions by cumulative byte size so each holds about
    * `targetBytes` of media — the binary-column analogue of
    * files.maxPartitionBytes. One shuffle, then every downstream narrow
    * op is balanced.
    */
  def repartitionBySize(media: DataFrame, targetBytes: Long): DataFrame = {
    val total = media.agg(sum(octet_length(col("bytes"))))
      .collect()(0).getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    media.repartition(parts, pmod(xxhash64(col("media_id")), lit(parts)))
  }
}
