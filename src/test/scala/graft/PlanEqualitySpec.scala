package graft

/** Evidence that the SQL-text and DataFrame surfaces share ONE
  * optimizer path (VERDICT r04 #8): the registered DataFrame form of
  * q_topk_group and its oracle SQL string, run through spark.sql over
  * the same view, must canonicalize to the SAME optimized logical
  * plan — not merely equal results. This is the architectural claim
  * of the engine (declare the plan, let Catalyst pick the physical
  * strategy) made checkable: if the DataFrame builder ever drifts
  * into a shape Catalyst can't fold back (an extra exchange, a
  * non-collapsible projection), this fails.
  */
class PlanEqualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_topk_group: SQL text and DataFrame forms optimize to one " +
    "identical logical plan") {
    Q.t(spark, dir, "orders").createOrReplaceTempView("orders")
    val df = Queries.queries("q_topk_group")(spark, dir)
    val viaSql = spark.sql(Queries.oracleSql("q_topk_group"))
    val a = df.queryExecution.optimizedPlan.canonicalized
    val b = viaSql.queryExecution.optimizedPlan.canonicalized
    assert(a == b,
      s"optimized plans diverged:\n== DataFrame ==\n$a\n== SQL ==\n$b")
  }

  test("q_limit_sort: SQL text and DataFrame forms optimize to one " +
    "identical logical plan") {
    Q.t(spark, dir, "orders").createOrReplaceTempView("orders")
    val df = Queries.queries("q_limit_sort")(spark, dir)
    val viaSql = spark.sql(Queries.oracleSql("q_limit_sort"))
    val a = df.queryExecution.optimizedPlan.canonicalized
    val b = viaSql.queryExecution.optimizedPlan.canonicalized
    assert(a == b,
      s"optimized plans diverged:\n== DataFrame ==\n$a\n== SQL ==\n$b")
  }

  test("q_sql_text4: correlated EXISTS / NOT EXISTS decorrelate to " +
    "left-semi / left-anti joins with no residual subquery") {
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = Queries.queries("q_sql_text4")(spark, dir)
      .queryExecution.optimizedPlan
    val joinTypes = plan.collect { case j: Join => j.joinType }
    assert(joinTypes.contains(LeftSemi) && joinTypes.contains(LeftAnti),
      s"expected decorrelated semi+anti joins, got $joinTypes")
    // no correlated subquery survives optimization — the plan is pure
    // joins + aggregate, never a per-row subquery execution; walk the
    // WHOLE tree (a PlanExpression below the root would otherwise hide)
    val residual = plan.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect { case p: PlanExpression[_] => p })
    assert(residual.isEmpty, s"residual subqueries: $residual")
  }

  test("q_sql_text6: correlated scalar MIN subquery decorrelates to an " +
    "aggregate-then-join with no residual subquery anywhere in the tree") {
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = Queries.queries("q_sql_text6")(spark, dir)
      .queryExecution.optimizedPlan
    // the per-part MIN must have become a standalone Aggregate feeding
    // a join on the correlation key — i.e. at least one aggregate UNDER
    // a join in the tree
    val aggUnderJoin = plan.collect { case j: Join => j }.exists(j =>
      j.collectFirst { case a: Aggregate => a }.isDefined)
    assert(aggUnderJoin,
      s"no aggregate-under-join found — decorrelation did not fire:\n$plan")
    val residual = plan.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect { case p: PlanExpression[_] => p })
    assert(residual.isEmpty, s"residual subqueries: $residual")
  }

  test("q_sql_text7: IN-subquery nesting a correlated scalar AVG " +
    "decorrelates fully — semi joins + aggregate, no residual subquery") {
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = Queries.queries("q_sql_text7")(spark, dir)
      .queryExecution.optimizedPlan
    val joinTypes = plan.collect { case j: Join => j.joinType }
    assert(joinTypes.count(_ == LeftSemi) >= 2,
      s"expected >=2 semi joins (outer IN + inner IN), got $joinTypes")
    val aggUnderJoin = plan.collect { case j: Join => j }.exists(j =>
      j.collectFirst { case a: Aggregate => a }.isDefined)
    assert(aggUnderJoin,
      s"no aggregate-under-join — scalar decorrelation did not fire:\n$plan")
    val residual = plan.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect { case p: PlanExpression[_] => p })
    assert(residual.isEmpty, s"residual subqueries: $residual")
  }
}
