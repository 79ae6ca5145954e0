package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QDotLongSpec extends SparkSpec {
  import spark.implicits._

  test("qdot_long matches the interpreted HOF fold on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Seq.fill(16)(rnd.nextLong(2000000L) - 1000000L),
        Seq.fill(16)(rnd.nextLong(2000000L) - 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select($"id",
        Native.qdotLong($"a", $"b").as("native"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L),
          (acc, p) => acc + p).as("fold"))
    assert(both.filter($"native" =!= $"fold").count() == 0)
  }

  test("null semantics: null array -> null; null elements contribute 0") {
    val df = Seq(
      (1L, Some(Seq[java.lang.Long](1L, 2L)),
        Some(Seq[java.lang.Long](3L, 4L))),
      (2L, None, Some(Seq[java.lang.Long](3L))),
      (3L, Some(Seq[java.lang.Long](1L, null, 3L)),
        Some(Seq[java.lang.Long](5L, 7L, 11L))))
      .toDF("id", "a", "b")
    val out = df.select($"id", Native.qdotLong($"a", $"b").as("d"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(11L), 2L -> None, 3L -> Some(38L)))
  }

  test("length mismatch sums over the common prefix") {
    val df = Seq((Seq(2L, 3L, 100L), Seq(5L, 7L))).toDF("a", "b")
    assert(df.select(Native.qdotLong($"a", $"b")).as[Long].head() == 31L)
  }

  test("registers as SQL function qdot_long via Native.register") {
    Native.register(spark)
    Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .createOrReplaceTempView("graft_qdot_t")
    assert(spark.sql("SELECT qdot_long(a, b) AS d FROM graft_qdot_t")
      .as[Long].head() == 11L)
  }

  test("stays inside whole-stage codegen (no interpreted fallback)") {
    // spark.range keeps the projection in the physical plan (a literal
    // Seq would constant-fold into a LocalTableScan before execution)
    val df = spark.range(4)
      .select(array($"id", $"id" * 2).as("a"),
        array($"id" + 1, $"id" + 3).as("b"))
      .select(Native.qdotLong($"a", $"b").as("d"))
    // '*(n)' prefixes mark operators fused into WholeStageCodegen in
    // the plan's simple string; the Project carrying qdot_long must be
    // inside one (an interpreted fallback would print a bare Project).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // row id=3: [3,6]·[4,6] = 48 — and it actually executes compiled
    assert(df.as[Long].collect().toSeq == Seq(0L, 10L, 26L, 48L))
  }
}
