package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet star-schema loaders for the driver testdata (TESTDATA.md) plus
  * the reference-shaped ingest paths: string-typed TSV load and nested
  * NDJSON load with overwrite/append semantics
  * (reference: load_component.py:3-58, generator_component.py:102-147,
  * logger/main.py:107-150).
  */
object Tables {

  val starTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet columns stored as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with `nanosAsLong` they surface as LongType and we
    * rebuild a microsecond TimestampType (matching what DuckDB reads).
    */
  private val nanosTimestampCols = Set("events.ts")

  /** Read one testdata table. Plain parquet scan — Catalyst handles column
    * pruning + predicate pushdown from whatever the caller stacks on top.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType &&
          nanosTimestampCols.contains(s"$name.${f.name}"))
        // integer div: ns → µs, exact and identical to DuckDB's ns→µs cast
        d.withColumn(f.name,
          org.apache.spark.sql.functions.expr(
            s"timestamp_micros(${f.name} div 1000)"))
      else d
    }
  }

  // --------------------------------------------------------------------
  // Reference-shaped schemas (SURVEY.md §1.2, FIXTURES.md §A)
  // --------------------------------------------------------------------

  /** MovieLens u.data quirk preserved from the reference
    * (load_component.py:31-36): ALL FOUR columns ingest as STRING;
    * typing happens in a separate normalize step.
    */
  val ratingsRawSchema: StructType = StructType(Seq(
    StructField("item_id", StringType),
    StructField("user_id", StringType),
    StructField("rating", StringType),
    StructField("timestamp", StringType)))

  /** Nested RL trajectory schema (generator_component.py:122-137,
    * logger/main.py:127-142): arrays + array-of-struct-of-array.
    */
  val trajectorySchema: StructType = StructType(Seq(
    StructField("step_type", ArrayType(LongType)),
    StructField("observation", ArrayType(StructType(Seq(
      StructField("observation_batch", ArrayType(DoubleType)))))),
    StructField("action", ArrayType(LongType)),
    StructField("policy_info", ArrayType(DoubleType)),
    StructField("next_step_type", ArrayType(LongType)),
    StructField("reward", ArrayType(DoubleType)),
    StructField("discount", ArrayType(DoubleType))))

  /** TSV scan with explicit schema, no header, tab delimiter — the A1
    * load path (load_component.py:38-41). `mode=PERMISSIVE` mirrors
    * BigQuery's tolerant CSV load (u.data's truncated last row loads with
    * nulls rather than failing).
    */
  def readTsv(spark: SparkSession, path: String,
              schema: StructType = ratingsRawSchema): DataFrame =
    spark.read.schema(schema)
      .option("sep", "\t").option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Normalize step for the string-typed ratings ingest: late cast,
    * unix-seconds → TIMESTAMP (notebook.ipynb:197 — seconds since epoch
    * UTC). Kept separate from the scan on purpose (A1 quirk).
    */
  def normalizeRatings(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.select(
      col("user_id").cast(IntegerType).as("user_id"),
      col("item_id").cast(IntegerType).as("item_id"),
      col("rating").cast(IntegerType).as("rating"),
      to_timestamp(from_unixtime(col("timestamp").cast(LongType))).as("ts"))
  }

  /** NDJSON load with the explicit nested schema — A2/A3
    * (generator_component.py:138, logger/main.py:121-126). Schema is
    * always declared, never inferred (SURVEY.md §1.2).
    */
  def readNdjson(spark: SparkSession, path: String,
                 schema: StructType = trajectorySchema): DataFrame =
    spark.read.schema(schema).json(path)

  /** A2: WRITE_TRUNCATE equivalent. */
  def writeOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** A3: WRITE_APPEND equivalent — the feedback-loop sink. At-least-once
    * append semantics preserved (logger/main.py:126 does no dedup).
    */
  def writeAppend(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)
}
