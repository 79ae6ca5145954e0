package graft.feature

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withStore(f: FeatureStore => Unit): Unit = {
    val root = Files.createTempDirectory("fstest").toString
    f(new FeatureStore(spark, root))
  }

  test("registry DDL: create, list, delete (A13/A23)") {
    withStore { fs =>
      fs.createEntityType(EntityTypeDef("users", "user_id",
        Seq(FeatureDef("rating", "INT", "latest rating"))))
      fs.createEntityType(EntityTypeDef("items", "item_id", Seq.empty))
      assert(fs.listEntityTypes() == Seq("items", "users"))
      fs.deleteEntityType("items")
      assert(fs.listEntityTypes() == Seq("users"))
    }
  }

  test("bulk import stamps feature_ts and appends (A14)") {
    withStore { fs =>
      fs.createEntityType(EntityTypeDef("users", "user_id", Seq.empty))
      val batch = Seq((1L, 5.0), (2L, 3.0)).toDF("user_id", "rating")
      fs.importFeatureValues("users", batch, "user_id",
        Some(ts("2024-01-01 00:00:00")))
      fs.importFeatureValues("users", batch.withColumn("rating",
        $"rating" + 1), "user_id", Some(ts("2024-02-01 00:00:00")))
      val vals = fs.readValues("users")
      assert(vals.count() == 4) // append-only: both versions kept
      assert(vals.select("feature_ts").distinct().count() == 2)
    }
  }

  test("streamingImport appends micro-batches with event-time stamps") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    withStore { fs =>
      fs.createEntityType(EntityTypeDef("users", "user_id", Seq.empty))
      val root = Files.createTempDirectory("fsstream").toString
      val in = MemoryStream[(Long, Double, Timestamp)]
      val q = fs.streamingImport("users",
        in.toDF().toDF("user_id", "rating", "event_ts"), "event_ts",
        s"$root/ckpt", Trigger.ProcessingTime("0 seconds"))
      try {
        in.addData((1L, 5.0, ts("2024-01-01 00:00:00")))
        q.processAllAvailable()
        in.addData((1L, 6.0, ts("2024-02-01 00:00:00")))
        q.processAllAvailable()
        val vals = fs.readValues("users")
        assert(vals.count() == 2)
        val online = fs.latestOnlineView("users", "user_id", "rating")
          .select("rating").as[Double].collect().toSeq
        assert(online == Seq(6.0))
      } finally q.stop()
    }
  }

  test("streamingPointInTime serves micro-batched queries through the " +
    "bucketed PIT path and never reads future feature values") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    withStore { fs =>
      fs.createEntityType(EntityTypeDef("users", "user_id", Seq.empty))
      fs.importFeatureValues("users",
        Seq((1L, 10.0), (2L, 5.0)).toDF("user_id", "rating"), "user_id",
        Some(ts("2024-01-01 00:00:00")))
      fs.importFeatureValues("users",
        Seq((1L, 20.0)).toDF("user_id", "rating"), "user_id",
        Some(ts("2024-03-01 00:00:00")))
      fs.compactBucketed("users", "user_id", "b_pit_stream", 4)
      val root = Files.createTempDirectory("fspitstream").toString
      val in = MemoryStream[(Long, Timestamp)]
      val q = fs.streamingPointInTime("b_pit_stream",
        in.toDF().toDF("user_id", "as_of"), "user_id", "as_of",
        Seq("rating"), s"$root/out", s"$root/ckpt",
        Trigger.ProcessingTime("0 seconds"))
      try {
        // the 20.0 value (2024-03-01) is ALREADY in the table when this
        // 2024-02-01 query streams in — PIT must still serve 10.0
        in.addData((1L, ts("2024-02-01 00:00:00")),
          (2L, ts("2023-12-01 00:00:00"))) // before any import -> null
        q.processAllAvailable()
        in.addData((1L, ts("2024-04-01 00:00:00"))) // after both -> 20.0
        q.processAllAvailable()
        val served = spark.read.parquet(s"$root/out")
          .select("user_id", "as_of", "asof_rating")
          .as[(Long, Timestamp, Option[Double])].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(served == Map(
          (1L, ts("2024-02-01 00:00:00")) -> Some(10.0),
          (2L, ts("2023-12-01 00:00:00")) -> None,
          (1L, ts("2024-04-01 00:00:00")) -> Some(20.0)),
          s"unexpected serving output: $served")
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS b_pit_stream")
      }
    }
  }

  test("point-in-time retrieval never reads the future; online view " +
      "returns the newest import (A15)") {
    withStore { fs =>
      fs.createEntityType(EntityTypeDef("users", "user_id", Seq.empty))
      fs.importFeatureValues("users",
        Seq((1L, 10.0)).toDF("user_id", "rating"), "user_id",
        Some(ts("2024-01-01 00:00:00")))
      fs.importFeatureValues("users",
        Seq((1L, 20.0)).toDF("user_id", "rating"), "user_id",
        Some(ts("2024-03-01 00:00:00")))
      val queries = Seq(
        (1L, ts("2024-02-01 00:00:00")),  // between imports -> 10.0
        (1L, ts("2024-04-01 00:00:00")))  // after both -> 20.0
        .toDF("user_id", "as_of")
      val pit = fs.pointInTime("users", queries, "user_id", "as_of",
          Seq("rating"))
        .select("as_of", "asof_rating")
        .as[(Timestamp, Double)].collect().toMap
      assert(pit == Map(ts("2024-02-01 00:00:00") -> 10.0,
        ts("2024-04-01 00:00:00") -> 20.0))
      val online = fs.latestOnlineView("users", "user_id", "rating")
        .select("user_id", "rating").as[(Long, Double)].collect().toSet
      assert(online == Set((1L, 20.0)))
    }
  }

  test("compactBucketed + pointInTimeBucketed wire the store to the " +
      "shuffle-lean PIT path with unchanged semantics") {
    withStore { fs =>
      fs.createEntityType(EntityTypeDef("users", "user_id", Seq.empty))
      fs.importFeatureValues("users",
        Seq((1L, 10.0)).toDF("user_id", "rating"), "user_id",
        Some(ts("2024-01-01 00:00:00")))
      fs.importFeatureValues("users",
        Seq((1L, 20.0)).toDF("user_id", "rating"), "user_id",
        Some(ts("2024-03-01 00:00:00")))
      fs.compactBucketed("users", "user_id", "b_users_vals", 4)
      try {
        val queries = Seq((1L, ts("2024-02-01 00:00:00")),
          (1L, ts("2024-04-01 00:00:00"))).toDF("user_id", "as_of")
        val fast = fs.pointInTimeBucketed("b_users_vals", queries,
          "user_id", "as_of", Seq("rating"))
        val ref = fs.pointInTime("users", queries, "user_id", "as_of",
          Seq("rating"))
        assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
      } finally spark.sql("DROP TABLE IF EXISTS b_users_vals")
    }
  }

  test("bucketed PIT: intervalized as-of is row-identical to asofJoin " +
      "and shuffles only the query side (100 TB note, plan-asserted)") {
    import graft.io.Bucketing
    import graft.ops.Relational
    val values = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-03-01 00:00:00"), 20.0),
      (1L, ts("2024-03-01 00:00:00"), 30.0), // equal-ts tie: 30 wins
      (2L, ts("2024-02-01 00:00:00"), 5.0),
      (3L, ts("2024-06-01 00:00:00"), 7.0))
      .toDF("user_id", "feature_ts", "rating")
    // Feature table written bucketed by entity — bucket count matches
    // the session's shuffle parallelism so EnsureRequirements keeps it.
    Bucketing.writeBucketed(values, "b_pit_vals", "user_id", 4)
    try {
      val queries = Seq(
        (1L, ts("2024-02-15 00:00:00")), // between imports -> 10.0
        (1L, ts("2024-03-01 00:00:00")), // tie ts, inclusive -> 30.0
        (1L, ts("2024-04-01 00:00:00")), // after both -> 30.0
        (2L, ts("2024-01-15 00:00:00")), // before first -> null
        (4L, ts("2024-05-01 00:00:00"))) // unknown entity -> null
        .toDF("user_id", "as_of")
      val fast = Relational.asofJoinIntervalized(
        queries.hint("merge"), spark.table("b_pit_vals"),
        "user_id", "as_of", "feature_ts", Seq("rating"))
      val ref = Relational.asofJoin(queries, values, "user_id",
        "as_of", "feature_ts", Seq("rating"))
      assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
      assert(fast.filter($"user_id" === 1 &&
        $"as_of" === ts("2024-03-01 00:00:00"))
        .select("asof_rating").as[Double].head() == 30.0)
      // The 100 TB contract: the bucketed feature scan feeds BOTH its
      // intervalizing window AND the sort-merge join with no Exchange;
      // the single hash shuffle in the plan belongs to the query side.
      val plan = fast.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1,
        plan)
    } finally spark.sql("DROP TABLE IF EXISTS b_pit_vals")
  }
}
