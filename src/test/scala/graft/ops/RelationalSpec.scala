package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: inclusive boundary, latest-wins, missing entity -> null") {
    val queries = Seq(
      (1L, ts("2024-01-01 10:00:00")), // exactly at a feature ts
      (1L, ts("2024-01-01 09:59:59")), // just before -> earlier value
      (2L, ts("2024-01-01 12:00:00")), // after both -> latest
      (3L, ts("2024-01-01 12:00:00"))) // no features at all
      .toDF("uid", "qts")
    val feats = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0),
      (2L, ts("2024-01-01 08:00:00"), 1.0),
      (2L, ts("2024-01-01 11:00:00"), 2.0))
      .toDF("uid", "fts", "value")
    val out = Relational.asofJoin(queries, feats, "uid", "qts", "fts",
        Seq("value"))
      .select($"uid", $"qts", $"asof_value")
      .as[(Long, Timestamp, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, ts("2024-01-01 10:00:00"), Some(20.0)),
      (1L, ts("2024-01-01 09:59:59"), Some(10.0)),
      (2L, ts("2024-01-01 12:00:00"), Some(2.0)),
      (3L, ts("2024-01-01 12:00:00"), None)))
  }

  test("asofJoin forward attaches the earliest at-or-after feature") {
    val queries = Seq(
      (1L, ts("2024-01-01 10:00:00")), // exactly at a feature -> itself
      (1L, ts("2024-01-01 09:00:01")), // just after 09:00 -> 10:00 row
      (1L, ts("2024-01-01 11:00:00"))) // after all -> null
      .toDF("uid", "qts")
    val feats = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0))
      .toDF("uid", "fts", "value")
    val out = Relational.asofJoin(queries, feats, "uid", "qts", "fts",
        Seq("value"), direction = "forward")
      .select($"qts", $"asof_value")
      .as[(Timestamp, Option[Double])].collect().toSet
    assert(out == Set(
      (ts("2024-01-01 10:00:00"), Some(20.0)),
      (ts("2024-01-01 09:00:01"), Some(20.0)),
      (ts("2024-01-01 11:00:00"), None)))
  }

  test("asofJoin never reads the future (property over events)") {
    val events = graft.io.Tables
      .table(spark, "/root/testdata/sf0.001", "events")
    val left = events.select($"user_id", $"ts".as("qts")).limit(200)
    val right = events.select($"user_id", $"ts".as("fts"),
      $"ts".as("seen_ts"), $"value")
    val joined = Relational.asofJoin(left, right, "user_id", "qts", "fts",
      Seq("seen_ts", "value"))
    val violations = joined
      .filter($"asof_seen_ts".isNotNull && $"asof_seen_ts" > $"qts")
      .count()
    assert(violations == 0)
  }

  test("asofJoin skips NULL feature values (treated as no-observation)") {
    val queries = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("uid", "qts")
    val feats = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(10.0)),
      (1L, ts("2024-01-01 10:00:00"), None)) // later but NULL
      .toDF("uid", "fts", "value")
    val out = Relational.asofJoin(queries, feats, "uid", "qts", "fts",
        Seq("value"))
      .select($"asof_value").as[Option[Double]].head()
    assert(out.contains(10.0))
  }

  test("latestPerKey returns one row per key, the newest") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00"), "old"),
      (1L, ts("2024-01-01 10:00:00"), "new"),
      (2L, ts("2024-01-01 08:00:00"), "only"))
      .toDF("uid", "fts", "v")
    val out = Relational.latestPerKey(df, "uid", "fts", "v")
      .select("uid", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "new"), (2L, "only")))
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:30"), 2L), // 30s gap -> same session
      (1L, ts("2024-01-01 10:01:30"), 3L), // 60s gap (== gap) -> same
      (1L, ts("2024-01-01 10:02:31"), 4L), // 61s gap -> new session
      (2L, ts("2024-01-01 10:00:00"), 5L))
      .toDF("user_id", "ts", "event_id")
    val out = Relational.sessionize(df, "user_id", "ts", "event_id", 60L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("intervalJoin matches the quadratic overlap join across buckets") {
    val a = Seq(
      (1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:30:00")),
      (2L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:10:00")))
      .toDF("aid", "st_a", "en_a")
    val b = Seq(
      (10L, ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00")), // ∩ 1
      (11L, ts("2024-01-01 02:30:00"), ts("2024-01-01 02:30:00")), // touch 1
      (12L, ts("2024-01-01 03:00:01"), ts("2024-01-01 04:00:00")), // none
      (13L, ts("2024-01-01 04:30:00"), ts("2024-01-01 05:01:00"))) // ∩ 2
      .toDF("bid", "st_b", "en_b")
    val out = Relational.intervalJoin(a, b, "st_a", "en_a",
        "st_b", "en_b", bucketSeconds = 3600L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 13L)))
    // multi-bucket spans produce each pair exactly once
    val n = Relational.intervalJoin(a, b, "st_a", "en_a",
      "st_b", "en_b", bucketSeconds = 60L).count()
    assert(n == 3L)
  }

  test("bandJoin matches the quadratic BETWEEN join, incl. boundaries") {
    val points = Seq((1L, -60.0), (2L, 0.0), (3L, 59.9), (4L, 60.0),
      (5L, 60.1), (6L, 180.0), (7L, -180.0)).toDF("pid", "v")
    val bands = Seq((10L, 0.0), (11L, 120.0), (12L, -120.0))
      .toDF("bid", "c")
    val out = Relational.bandJoin(points, bands, "v", "c", 60.0)
      .select("pid", "bid").as[(Long, Long)].collect().toSet
    // oracle: v BETWEEN c-60 AND c+60 (inclusive both ends)
    val expect = for {
      (p, v) <- Seq(1L -> -60.0, 2L -> 0.0, 3L -> 59.9, 4L -> 60.0,
        5L -> 60.1, 6L -> 180.0, 7L -> -180.0)
      (b, c) <- Seq(10L -> 0.0, 11L -> 120.0, 12L -> -120.0)
      if v >= c - 60 && v <= c + 60
    } yield (p, b)
    assert(out == expect.toSet)
    // each qualifying pair appears exactly once (points map to 1 bucket)
    assert(Relational.bandJoin(points, bands, "v", "c", 60.0).count() ==
      expect.size.toLong)
  }

  test("q_join_range plans a bucket equi-join, not a nested-loop over " +
    "the supplier×part pair space (gen-sf10 sweep regression)") {
    val plan = graft.Queries.queries("q_join_range")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan
    val expanded = plan +: plan.collect {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a.executedPlan
    }
    val bad = expanded.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => j.getClass.getSimpleName
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        j.getClass.getSimpleName
    })
    assert(bad.isEmpty, s"non-equi pair-space join in plan:\n$plan")
  }

  test("hashSplit is exhaustive, disjoint, and stable under growth") {
    val bands = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val small = spark.range(0, 100).toDF("id")
    val big = spark.range(0, 10000).toDF("id")
    val s1 = Relational.hashSplit(small, "id", 11L, bands)
      .as[(Long, String)].collect().toMap
    val s2 = Relational.hashSplit(big, "id", 11L, bands)
      .as[(Long, String)].collect().toMap
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    // membership of an id never changes when more rows arrive
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    // ~80/10/10 at n=10000 (hash-uniform, not exact)
    val frac = s2.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(frac("train") > 7500 && frac("train") < 8500, frac)
    intercept[IllegalArgumentException] {
      Relational.hashSplit(small, "id", 0L, Seq("a" -> 500))
    }
  }

  test("topKPerGroup caps rows per group with deterministic rank") {
    val df = Seq(("a", 3L, 1L), ("a", 2L, 2L), ("a", 1L, 3L), ("b", 9L, 4L))
      .toDF("g", "score", "id")
    val out = Relational.topKPerGroup(df, Seq($"g"),
        Seq($"score".desc, $"id"), 2)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 4L)))
  }
}
