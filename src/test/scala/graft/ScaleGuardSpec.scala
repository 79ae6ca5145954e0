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
