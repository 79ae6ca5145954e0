package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing — the shuffle-elimination path for repeated
  * large joins (SURVEY.md §7 "pre-bucket by key so the shuffle
  * disappears"). At 100 TB, the big fact tables are written once
  * bucketed+sorted by their join key; every subsequent equi-join on
  * that key is a zero-Exchange sort-merge join (verified by plan
  * inspection in BucketingSpec).
  */
object Bucketing {

  /** Write a bucketed + sorted managed parquet table. Bucket count
    * should divide evenly into executor cores at the target scale
    * (e.g. 4096 buckets for a 1000-executor cluster).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count: no shuffle Exchange on either side, no sort if `sortBy`
    * matched. Hinted to sort-merge — broadcast would ignore the
    * bucketing (and at the scales where bucketing matters, neither side
    * broadcasts anyway).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, how: String = "inner"): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right), Seq(key), how)
}
