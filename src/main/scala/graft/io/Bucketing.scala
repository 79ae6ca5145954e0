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
                    buckets: Int): Unit = {
    // Self-healing across JVMs: a previous run's warehouse directory
    // can outlive its in-memory catalog entry (the catalog dies with
    // the JVM, the directory does not), in which case saveAsTable
    // fails with LOCATION_ALREADY_EXISTS even under mode(overwrite).
    // Clear BOTH sides before writing.
    // Unqualified names only: the stale-dir path below is computed as
    // <warehouse>/<table>, which is wrong for db-qualified tables
    // (<warehouse>/db.db/tbl) — and `db.tbl` would be backtick-quoted
    // into a single identifier in the DROP.
    require(!table.contains('.'),
      s"writeBucketed requires an unqualified table name, got '$table'")
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

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
