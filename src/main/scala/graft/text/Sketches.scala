package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count–min sketch over a token stream — the fixed-memory heavy-hitter
  * estimator (the streaming/mergeable complement to an exact groupBy:
  * the sketch is depth×width counters regardless of vocabulary size,
  * and per-partition sketches merge by cell-wise addition, which is
  * exactly what the partial aggregation below does).
  *
  * Estimates are biased UP only: est(t) = min over rows of
  * cell(h_r(t)) ≥ true(t), and est(t) ≤ true(t) + εN with
  * ε = e/width at the usual depth. Both properties are spec-tested.
  * Default hashing is xxhash64(term, seed=row) → not DuckDB-expressible
  * → rows-only at the query level; the md5 hash family
  * ([[md5BucketHash]]) is cross-engine (Spark conv(hex,16,10) ≡ DuckDB
  * CAST('0x'||hex AS BIGINT)) and powers the oracle-green
  * `q_heavy_hitters_md5` twin with the identical plan shape.
  */
object Sketches {

  type BucketHash = (Column, Column, Int) => Column

  /** (item, row, width) → cell index via xxhash64 seeded by the row. */
  val xxBucketHash: BucketHash = (it, row, width) =>
    pmod(xxhash64(it, row), lit(width.toLong))

  /** Cross-engine cell index: top 60 bits of md5("row|item") — the
    * dedup-md5 idiom extended to numeric buckets (15 hex chars fit a
    * signed long in both engines, and the '|' separator makes the
    * preimage unambiguous).
    */
  val md5BucketHash: BucketHash = (it, row, width) =>
    conv(substring(md5(concat(row.cast(StringType), lit("|"), it)),
      1, 15), 16, 10).cast(LongType) % width.toLong

  /** Build the (row, bucket, cnt) sketch table: depth × width cells.
    * One pass over the stream; the explode is depth rows per token but
    * the groupBy partial-aggregates to ≤ depth×width per partition —
    * the shuffle carries sketch cells, not the stream.
    */
  def cmsBuild(items: DataFrame, itemCol: String, depth: Int,
               width: Int, hash: BucketHash = xxBucketHash): DataFrame =
    items.select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col(itemCol).as("__it"))
      .select(col("row"),
        hash(col("__it"), col("row"), width).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for `candidates` (one column `itemCol`):
    * min over depth rows of the hashed cell. The sketch side is tiny
    * (depth×width) — broadcast; candidates never shuffle.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  itemCol: String, depth: Int, width: Int,
                  hash: BucketHash = xxBucketHash): DataFrame =
    candidates
      .select(col(itemCol), explode(sequence(lit(0), lit(depth - 1)))
        .as("row"))
      .withColumn("bucket", hash(col(itemCol), col("row"), width))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
