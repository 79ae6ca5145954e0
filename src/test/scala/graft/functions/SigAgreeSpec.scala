package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SigAgreeSpec extends SparkSpec {
  import spark.implicits._

  private def hofAgree(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column) =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))

  test("native agreement count is identical to the declarative HOF form") {
    val rnd = new scala.util.Random(29)
    // Draw from a small value domain so positions genuinely collide.
    val df = Seq.tabulate(300) { i =>
      (i.toLong,
        Seq.fill(32)(rnd.nextInt(4).toLong),
        Seq.fill(32)(rnd.nextInt(4).toLong))
    }.toDF("id", "a", "b")
    val both = df.select($"id", Native.sigAgree($"a", $"b").as("native"),
      hofAgree($"a", $"b").as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
  }

  test("counts over the common prefix; null arrays yield null") {
    val df = Seq(
      (1L, Some(Seq(1L, 2L, 3L, 4L)), Some(Seq(1L, 9L, 3L))),
      (2L, Some(Seq(5L)), None),
      (3L, Some(Seq.empty[Long]), Some(Seq(1L))))
      .toDF("id", "a", "b")
    val out = df.select($"id", Native.sigAgree($"a", $"b").as("n"))
      .as[(Long, Option[Int])].collect().toMap
    assert(out(1L).contains(2)) // positions 0 and 2 of the 3-long prefix
    assert(out(2L).isEmpty)
    assert(out(3L).contains(0))
  }

  test("interpreted eval matches codegen (off-codegen paths agree)") {
    val viaCodegen = Seq((Seq(7L, -3L, 42L), Seq(7L, 3L, 42L)))
      .toDF("a", "b").select(Native.sigAgree($"a", $"b")).as[Int].head()
    // Literal-input fold runs the interpreted eval path at optimize time
    val viaInterp = spark.range(1)
      .select(Native.sigAgree(array(lit(7L), lit(-3L), lit(42L)),
        array(lit(7L), lit(3L), lit(42L)))).as[Int].head()
    assert(viaCodegen == 2 && viaInterp == 2)
  }

  test("SQL registration resolves sig_agree") {
    Native.register(spark)
    val n = spark.sql(
      "SELECT sig_agree(array(1L, 2L, 3L), array(1L, 0L, 3L))")
      .as[Int].head()
    assert(n == 2)
  }
}
