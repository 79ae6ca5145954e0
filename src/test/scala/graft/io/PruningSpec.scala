package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning + filter pushdown — the data-skipping layer that
  * makes a 100 TB scan touch only the slices a query needs.
  */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned writes prune to matching partitions only") {
    val dir = Files.createTempDirectory("pruned").toString
    val events = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_date", to_date($"ts"))
    events.write.partitionBy("event_date").parquet(s"$dir/events")
    val read = spark.read.parquet(s"$dir/events")
    val dates = events.select("event_date").distinct().count()
    val oneDay = read.filter($"event_date" ===
      events.agg(min("event_date")).collect()(0).getDate(0))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // the scan's file listing covers exactly one of the date partitions
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.contains(1), s"scanned=$scanned of $dates partitions")
  }

  test("parquet min/max row-group stats push value predicates to scan") {
    val li = Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_quantity" > 49.0)
    val plan = li.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity,49.0)"), plan)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // At 100 TB a selective dim predicate should reach the fact scan
    // BEFORE the shuffle: Spark's runtime bloom filter builds on the
    // filtered creation side and injects might_contain into the fact
    // scan. Thresholds are sized for cluster tables, so the test
    // lowers them; conf restored after (shared session contract).
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "-1") // force a shuffle join
      spark.conf.set(keys(1), "true")
      spark.conf.set(keys(2), "0")
      spark.conf.set(keys(3), "100MB")
      val orders = Tables.table(spark, "/root/testdata/sf0.001",
        "orders").filter($"o_totalprice" > 400000.0)
      val li = Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
      val j = li.join(orders, $"l_orderkey" === $"o_orderkey")
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") ||
        plan.contains("might_contain"), plan)
      // semantics unchanged by the injected filter
      val expected = li.join(orders.hint("broadcast"),
        $"l_orderkey" === $"o_orderkey").count()
      assert(j.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
