package graft.text

import org.apache.spark.sql.DataFrame
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
  * Hashing is xxhash64(term, seed=row) → not DuckDB-expressible →
  * rows-only at the query level.
  */
object Sketches {

  /** Build the (row, bucket, cnt) sketch table: depth × width cells.
    * One pass over the stream; the explode is depth rows per token but
    * the groupBy partial-aggregates to ≤ depth×width per partition —
    * the shuffle carries sketch cells, not the stream.
    */
  def cmsBuild(items: DataFrame, itemCol: String, depth: Int,
               width: Int): DataFrame =
    items.select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col(itemCol).as("__it"))
      .select(col("row"),
        pmod(xxhash64(col("__it"), col("row")), lit(width.toLong))
          .as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate counts for `candidates` (one column `itemCol`):
    * min over depth rows of the hashed cell. The sketch side is tiny
    * (depth×width) — broadcast; candidates never shuffle.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  itemCol: String, depth: Int, width: Int): DataFrame =
    candidates
      .select(col(itemCol), explode(sequence(lit(0), lit(depth - 1)))
        .as("row"))
      .withColumn("bucket",
        pmod(xxhash64(col(itemCol), col("row")), lit(width.toLong)))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
