package graft.io

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink format matrix: every interchange format available in
  * this container (parquet is the primary store; ORC columnar
  * alternative; CSV/JSON for ingest compatibility — A1/A2 heritage)
  * round-trips the same rows. Avro's datasource jar isn't shipped
  * here; TFRecord has its own byte-level suite (TfRecordsSpec).
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Tables
    .table(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "user_id", "event_type", "value")

  private def rows(df: DataFrame): Set[(Long, Long, String, Double)] =
    df.select($"event_id", $"user_id", $"event_type",
        coalesce($"value", lit(-1.0)))
      .as[(Long, Long, String, Double)].collect().toSet

  test("orc round-trips rows and pushes predicates to the reader") {
    val dir = Files.createTempDirectory("orc").toString + "/t"
    base.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(rows(back) == rows(base))
    val plan = back.filter($"value" > 40.0).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(value,40.0)"), plan)
  }

  test("csv round-trips rows with an explicit schema (A1 discipline)") {
    val dir = Files.createTempDirectory("csv").toString + "/t"
    base.write.option("header", "true").csv(dir)
    val back = spark.read.schema(base.schema)
      .option("header", "true").csv(dir)
    assert(rows(back) == rows(base))
  }

  test("json lines round-trip rows with an explicit schema (A2)") {
    val dir = Files.createTempDirectory("json").toString + "/t"
    base.write.json(dir)
    val back = spark.read.schema(base.schema).json(dir)
    assert(rows(back) == rows(base))
  }
}
