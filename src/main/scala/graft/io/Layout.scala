package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout (z-order clustering) — the storage-
  * side half of scan pruning at 100 TB.
  *
  * Parquet skips row groups / files from column min-max statistics, but
  * a table sorted by ONE key has tight stats only on that key: a
  * predicate on any other column still reads everything. Interleaving
  * the bits of several quantized keys into one z-value and range-
  * writing by it gives every file a contiguous z-range = a small
  * hyper-rectangle of the key space — min-max stats stay tight on ALL
  * interleaved dimensions, so predicates on any of them skip files.
  * (Same design as Delta's OPTIMIZE ZORDER BY; built here from plain
  * Spark: one stats aggregate, a codegen'd bit-interleave expression,
  * `repartitionByRange` + in-partition sort.)
  */
object Layout {

  /** Bit-interleaved z-value of pre-quantized non-negative ints
    * (each in [0, 2^bits)): column i contributes bit j to output bit
    * position j*n + i. Pure shifts/masks — codegen'd, no UDF.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && bits * qs.size <= 63,
      s"${qs.size} cols x $bits bits must fit a signed long")
    val n = qs.size
    val terms = for {
      (q, i) <- qs.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Linear min-max quantization of a numeric column to [0, 2^bits):
    * q = floor((x - min) / (max - min) * (2^bits - 1)). Min/max arrive
    * as columns (from one broadcast stats row). Constant columns (max
    * == min) quantize to 0. Linear cuts assume roughly uniform value
    * spread; heavily skewed keys want rank-based cuts (percentile
    * boundaries) — same interleave downstream.
    */
  def quantize(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val span = mx.cast("double") - mn.cast("double")
    val unit = (x.cast("double") - mn.cast("double")) / span
    when(span <= 0D || x.isNull, 0L)
      .otherwise(floor(unit * ((1L << bits) - 1)).cast("long"))
  }

  /** Z-value column over `cols` of `df`: one stats aggregate broadcast
    * back (no driver action), then quantize + interleave per row —
    * narrow and codegen'd.
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val stats = df.agg(
      min(col(cols.head)).as(s"__mn0"),
      (max(col(cols.head)).as(s"__mx0") +:
        cols.tail.zipWithIndex.flatMap { case (c, i) =>
          Seq(min(col(c)).as(s"__mn${i + 1}"),
            max(col(c)).as(s"__mx${i + 1}"))
        }): _*)
    val qs = cols.zipWithIndex.map { case (c, i) =>
      quantize(col(c), col(s"__mn$i"), col(s"__mx$i"), bits)
    }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleave(qs, bits))
      .drop(stats.columns: _*)
  }

  /** Write `df` z-ordered by `cols`: range-partition on the z-value
    * into `numFiles` contiguous z-ranges, sort within each, drop the
    * helper column, write parquet. Every output file then covers a
    * small hyper-rectangle of the key space — parquet min-max stats
    * prune scans filtered on ANY of `cols`.
    */
  def writeZordered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit =
    zvalue(df, cols, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory to ~`targetFileBytes` output files —
    * the small-file remedy for append-heavy sinks (each streaming
    * micro-batch / retry leaves its own files; thousands of tiny files
    * turn a 100 TB scan into a metadata stampede). Sizing comes from
    * the actual on-disk bytes (file listing, no data read); the rewrite
    * itself is one shuffle-free coalesce when shrinking. Returns the
    * output file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new java.io.File(path)
    val bytes = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    val tmp = path + "__compact_tmp"
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp)
    // Swap atomically at the directory level.
    val old = new java.io.File(path + "__compact_old")
    require(dir.renameTo(old) && new java.io.File(tmp).renameTo(dir),
      s"compaction swap failed for $path")
    old.listFiles().foreach(_.delete()); old.delete()
    n
  }
}
