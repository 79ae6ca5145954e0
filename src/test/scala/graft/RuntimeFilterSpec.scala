package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the scan-side pruning lever
  * [[Sessions.tuned]] enables for 100 TB: a selective filter on the
  * dim side of a join materializes as a bloom filter at runtime and a
  * might-contain predicate lands on the FACT-side scan, pruning row
  * groups before the shuffle. A static optimizer can't do this (the
  * surviving key set is only known at runtime). This spec pins the
  * injection so a conf regression (or a Spark upgrade flipping the
  * default) can't silently drop it.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a selective dim filter injects a bloom might-contain " +
    "predicate into the fact side of the join") {
    // Separate session: the injection gates on production-scale size
    // thresholds (application side >= 10 GB by default) — zero them so
    // local-scale parquet exhibits the cluster-scale plan shape.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val orders = Q.t(s2, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT") // selective dim side
    val lineitem = Q.t(s2, dir, "lineitem")          // fact side
    val joined = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val optimized = joined.queryExecution.optimizedPlan.toString
    // injected shape: fact side gains
    //   Filter might_contain(scalar-subquery [bloom_filter_agg(dim keys)],
    //                        xxhash64(l_orderkey))
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"no runtime bloom filter injected:\n$optimized")
  }
}
