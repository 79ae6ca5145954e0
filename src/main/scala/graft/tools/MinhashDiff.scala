package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions

/** Differential check for the two-stage MinHash verification
  * (Dedup.minhashPairs with the signature-estimate prefilter vs the
  * single-stage exact pipeline): runs BOTH at the registered
  * q_dedup_minhash parameters (n=2, k=32, bands=8, τ=0.5) on one sf
  * dir and prints the symmetric difference. The prefilter's recall
  * contract (Dedup.minhashPairs scaladoc) predicts ≤ ~1.4e-5 misses
  * per exact-boundary pair; this tool is the per-decade measurement
  * behind SURVEY §6.1's two-stage-verification record, and it appends
  * its JSON line to `sweeps/sweep_minhash_diff.jsonl` (SweepLog).
  *
  * TIMING IS SYMMETRIC (r12 verdict defect 1): Dedup.minhashPairs
  * caches its shingle/hash tables per call and the CacheManager
  * plan-matches them across calls, so whichever side runs second
  * would inherit the first side's cached tables — the r12 run printed
  * 42.9 s vs 18.5 s for identical-input pipelines purely from that
  * asymmetric warm. Each timed side now starts from
  * `spark.catalog.clearCache()` after a neutral JIT warm, mirroring
  * SlopeProbe.timed; the pair-set diff runs afterwards as a separate
  * untimed pass where shared caches are welcome.
  *
  * Usage: `runMain graft.tools.MinhashDiff <sfDir> [--two-stage-only]`.
  * `--two-stage-only` skips the single-stage side — at gen-sf100 the
  * single-stage pipeline IS the ~600 GB-spill ENOSPC this tool exists
  * to retire, so the last decade measures completion (wall + pair
  * count) of the two-stage plan alone; the differential equality is
  * established at the decades where both sides fit.
  */
object MinhashDiff {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val twoStageOnly = args.contains("--two-stage-only")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"),
        Sessions.shuffleParts(cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    def run(sigmas: Double) =
      graft.text.Dedup.minhashPairs(docs, "text", "doc_id",
          n = 2, k = 32, bands = 8, minJaccard = 0.5,
          prefilterSigmas = sigmas)
        .select("doc_a", "doc_b", "n_inter", "n_union")
    // neutral JIT/codegen warm (NOT a minhash pipeline — that would
    // leave one side's tables cached and re-introduce the bias)
    spark.range(1000000L)
      .select(xxhash64(col("id")).as("h"))
      .groupBy(col("h") % 7).agg(count(lit(1))).count()
    // ...and an input-page warm: whichever side is timed FIRST would
    // otherwise alone pay the cold parquet data-page reads (a plain
    // count() is footer-only, so force the text pages through length()).
    // The r13 ladder rows predate this line (consistent method within
    // each ladder; at the 150k-doc decades run-to-run noise exceeds the
    // cold-read delta either way — SURVEY §6.1).
    docs.select(length(col("text")).as("l")).agg(sum(col("l"))).head()
    def timed(sigmas: Double): (Long, Double) = {
      spark.catalog.clearCache()
      val t = System.nanoTime()
      val rows = run(sigmas).count()
      (rows, (System.nanoTime() - t) / 1e9)
    }
    val (nNew, sNew) = timed(3.0)
    if (twoStageOnly) {
      SweepLog.append("minhash_diff",
        s"""{"sf":"$sfDir","mode":"minhash_diff",""" +
        s""""pairs_two_stage":$nNew,"sec_two_stage":$sNew}""")
    } else {
      val (nOld, sOld) = timed(Double.PositiveInfinity)
      // untimed equality pass — shared shingle/signature caches are
      // fine here (both sides read the same cached tables)
      val twoStage = run(3.0).cache()
      val single = run(Double.PositiveInfinity).cache()
      val missed = single.exceptAll(twoStage).count()
      val extra = twoStage.exceptAll(single).count()
      SweepLog.append("minhash_diff",
        s"""{"sf":"$sfDir","mode":"minhash_diff",""" +
        s""""pairs_two_stage":$nNew,"sec_two_stage":$sNew,""" +
        s""""pairs_single_stage":$nOld,"sec_single_stage":$sOld,""" +
        s""""missed_by_prefilter":$missed,"extra":$extra}""")
    }
    spark.stop()
  }
}
