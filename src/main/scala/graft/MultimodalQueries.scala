package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.Media

/** Multimodal-column operators over the synthetic media table derived
  * from documents (multimodal/Media.scala). The declarative plumbing
  * (schema derivation, metadata aggregation, frame-sample fan-out) is
  * oracle-checked; the stub-codec feature extraction is rows-only.
  */
object MultimodalQueries {

  def specs: Seq[QuerySpec] = Seq(

    // -- typed-metadata aggregation over binary media columns -----------
    QuerySpec.sql("q_media_meta")(
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       count(*) AS n,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT)
        |         AS total_bytes,
        |       CAST(sum(doc_id % 64 * 16 + 64) AS BIGINT) AS sum_width
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin) {
      (s, dir) =>
        Media.syntheticFromDocuments(Q.t(s, dir, "documents"))
          .groupBy("kind")
          .agg(count(lit(1)).as("n"),
            sum(octet_length(col("bytes"))).as("total_bytes"),
            sum(col("meta.width")).cast(LongType).as("sum_width"))
          .orderBy("kind")
    },

    // -- video frame-sample fan-out (declarative explode) ---------------
    QuerySpec.sql("q_frame_sample")(
      """SELECT doc_id AS media_id, CAST(i/1000 AS BIGINT) AS frame_idx,
        |       CAST(i AS BIGINT) AS frame_ts_ms
        |FROM (SELECT doc_id,
        |        unnest(range(0, n_chars*40 + 1, 1000)) AS i
        |      FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Media.sampleFrames(
          Media.syntheticFromDocuments(Q.t(s, dir, "documents")),
          everyMs = 1000L)
        .select("media_id", "frame_idx", "frame_ts_ms")
        .orderBy("media_id", "frame_idx")
    },

    // -- byte-level frame stats over the binary column (oracle-green
    // decode path): the synthetic media bytes are utf8 of the ASCII
    // document text, so DuckDB reproduces every per-frame stat from
    // character codes while Spark computes them from the raw bytes in
    // the same partition-local batched shape a real codec runs in ------
    QuerySpec.sql("q_media_bytestats")(
      """WITH c AS (SELECT doc_id, j // 256 AS frame_idx,
        |    ord(substring(text, CAST(j + 1 AS INT), 1)) AS b
        |  FROM (SELECT doc_id, text, unnest(range(0, length(text))) AS j
        |        FROM documents))
        |SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS n_bytes,
        |  CAST(sum(b) AS BIGINT) AS checksum,
        |  CAST(min(b) AS INT) AS lo,
        |  CAST(max(b) AS INT) AS hi,
        |  CAST(sum(CASE WHEN b = 32 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_space
        |FROM c GROUP BY 1, 2, 3
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      Media.byteFrameStats(
          Media.syntheticFromDocuments(Q.t(s, dir, "documents")),
          frameBytes = 256)
        .orderBy("media_id", "frame_idx")
    },

    // -- batched stub-codec feature extraction (rows-only) --------------
    QuerySpec.rowsOnly("q_media_features") { (s, dir) =>
      val media = Media.syntheticFromDocuments(Q.t(s, dir, "documents"))
      Media.extractFeatures(media, Media.StubCodec, dim = 16)
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(size(col("features"))).as("total_dims"))
        .orderBy("kind")
    },

    // -- multimodal retrieval: decode → embed → ANN top-k (rows-only;
    // stub features, but the full cross-module pipeline is real) --------
    QuerySpec.rowsOnly("q_media_similarity") { (s, dir) =>
      val media = Media.syntheticFromDocuments(Q.t(s, dir, "documents"))
      val feats = Media.extractFeatures(media, Media.StubCodec, dim = 16)
        .select(col("media_id"), col("features"))
      graft.text.Similarity.bruteForceTopK(feats,
          feats.filter(col("media_id") < 10), "media_id", "features",
          k = 3, dim = 16)
        .orderBy("query_id", "rnk")
    }
  )
}
