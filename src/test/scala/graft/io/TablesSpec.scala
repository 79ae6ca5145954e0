package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("TSV ingests all-string with permissive malformed-row handling " +
      "(A1 quirk: u.data truncated last line)") {
    val dir = Files.createTempDirectory("tsv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.data"),
      "196\t242\t3\t881250949\n186\t302\t3\t891717742\n22\t377\t1\n")
    val raw = Tables.readTsv(spark, s"$dir/u.data")
    assert(raw.schema.fields.forall(_.dataType.typeName == "string"))
    assert(raw.count() == 3)
    val truncated = raw.filter($"timestamp".isNull)
    assert(truncated.count() == 1)
  }

  test("normalize casts late: strings -> ints + unix-seconds timestamp") {
    val raw = Seq(("242", "196", "3", "881250949"))
      .toDF("item_id", "user_id", "rating", "timestamp")
    val n = Tables.normalizeRatings(raw)
    val r = n.select($"user_id", $"rating",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
      .as[(Int, Int, String)].head()
    assert(r == ((196, 3, "1997-12-04 15:55:49"))) // UTC
  }

  test("schema-drift canary: driver testdata matches the pinned star " +
      "catalog through Tables.table (r9: events.ts silently changed " +
      "TIMESTAMP(NANOS) -> TIMESTAMP_NTZ and three queries vanished)") {
    val drift = Tables.schemaDrift(spark, "/root/testdata/sf0.001")
    assert(drift.isEmpty, drift.mkString("\n"))
  }

  test("schema-drift canary names the drifted column and both types on " +
      "a planted-drift fixture") {
    val dir = Files.createTempDirectory("drift").toString
    // copy the real sf0.001 tables, then replant events with ts drifted
    // to string (a LongType plant would be swallowed by the legitimate
    // nanos-as-long rebuild) plus a dropped column
    for (t <- Tables.starTables)
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    spark.read.parquet(s"/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", date_format($"ts".cast("timestamp"),
        "yyyy-MM-dd HH:mm:ss"))
      .drop("props") // and a missing column
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val drift = Tables.schemaDrift(spark, dir)
    assert(drift.exists(d => d.contains("events.ts") &&
      d.contains("timestamp") && d.contains("string")),
      s"ts drift not named: $drift")
    assert(drift.exists(_.contains("events.props")), s"missing col: $drift")
    // and the untouched tables contribute no noise
    assert(drift.forall(_.startsWith("events.")), drift.mkString("\n"))
  }

  test("NDJSON nested trajectory schema round-trips (A2) and append " +
      "doubles rows (A3)") {
    val dir = Files.createTempDirectory("ndjson").toString
    val json =
      """{"step_type":[0,1],"observation":[{"observation_batch":[0.1,0.2]},
        |{"observation_batch":[0.3,0.4]}],"action":[5,7],
        |"policy_info":[],"next_step_type":[1,2],"reward":[0.0,1.0],
        |"discount":[1.0,1.0]}""".stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.json"),
      json + "\n" + json + "\n")
    val df = Tables.readNdjson(spark, s"$dir/t.json")
    assert(df.count() == 2)
    // nested flatten (A7): array-of-struct -> array-of-array
    val flat = df.select(transform($"observation",
      o => o.getField("observation_batch")).as("obs"))
    assert(flat.as[Seq[Seq[Double]]].head() ==
      Seq(Seq(0.1, 0.2), Seq(0.3, 0.4)))
    val sink = s"$dir/sink"
    Tables.writeOverwrite(df, sink)
    Tables.writeAppend(df, sink)
    assert(spark.read.parquet(sink).count() == 4)
    Tables.writeOverwrite(df, sink)
    assert(spark.read.parquet(sink).count() == 2)
  }
}
