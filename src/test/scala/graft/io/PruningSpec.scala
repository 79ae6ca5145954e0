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
}
