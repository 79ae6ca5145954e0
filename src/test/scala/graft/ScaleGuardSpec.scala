package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Repo-wide scale invariants, enforced over EVERY registered query's
  * physical plan (round-1 verdict: an unpartitioned window collapsed
  * q_zip_position to one task — this spec makes that class of
  * regression impossible to reintroduce silently).
  *
  * Checked on sf0.001 plans (planning only; queries with build-time
  * actions still run those, so this stays a test, not a compile check):
  *  - no Window over an empty partition spec (single-task total sort
  *    of the input — the final presentation ORDER BY is a plain Sort,
  *    not a Window, and is exempt: the driver contract requires it);
  *  - no CartesianProductExec (an unbroadcast cross join is the n×m
  *    pair-space blowup; the sanctioned pattern `crossJoin(broadcast(
  *    1-row aggregate))` plans as BroadcastNestedLoopJoin instead).
  */
class ScaleGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def offenders(p: SparkPlan): Seq[String] = {
    val expanded = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    } match {
      case Seq() => Seq(p)
      case inner => p +: inner
    }
    expanded.flatMap(_.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        s"global Window: ${w.windowExpression.mkString(",").take(80)}"
      case _: CartesianProductExec => "CartesianProduct"
    })
  }

  test("q_embed_pairs builds without driver-side actions and plans the " +
    "pair space as a broadcast nested-loop join") {
    val sc = spark.sparkContext
    // A driver-side collect during query CONSTRUCTION (the round-3
    // scale-killer: broadcast(rows.collect())) surfaces as an eager
    // ACTION job before any caller requests execution. Metadata jobs
    // (parquet footer/schema reads) are legitimate — so tag the build
    // with a job group and blacklist action-shaped stages inside it.
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (js.properties != null && "embed-pairs-build" ==
            js.properties.getProperty("spark.jobGroup.id"))
          js.stageInfos.foreach { si =>
            if (si.name.matches(
                "(collect|collectAsList|count|take|head|first) at .*"))
              actions.add(si.name)
          }
      }
    }
    sc.addSparkListener(listener)
    try {
      sc.setJobGroup("embed-pairs-build", "scale guard", false)
      val df = Queries.queries("q_embed_pairs")(spark, dir)
      val plan = df.queryExecution.executedPlan
      sc.clearJobGroup()
      Thread.sleep(2000) // listener bus is async
      assert(actions.isEmpty,
        s"query construction ran driver-side actions: $actions")
      val expanded = plan +: plan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }
      val bnlj = expanded.flatMap(_.collect {
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
      })
      assert(bnlj.nonEmpty,
        s"expected BroadcastNestedLoopJoin in:\n$plan")
    } finally sc.removeSparkListener(listener)
  }

  test("no query plans a global window or an unbroadcast cross join") {
    val bad = Queries.all.flatMap { spec =>
      try {
        val plan = spec.fn(spark, dir).queryExecution.executedPlan
        offenders(plan).map(o => s"${spec.name}: $o")
      } catch {
        case e: Throwable => Seq(s"${spec.name}: PLAN FAILED ${e.getMessage}")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
