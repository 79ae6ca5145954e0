package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places col i bit j at position j*n+i") {
    // q0 = 0b11 -> bits 0 and 2; q1 = 0b01 -> bit 1; z = 0b111 = 7
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.interleave(Seq($"a", $"b"), bits = 2).as("z"))
      .as[Long].head()
    assert(z == 7L)
    // single column degenerates to identity
    val id = Seq(11L).toDF("a")
      .select(Layout.interleave(Seq($"a"), bits = 8).as("z"))
      .as[Long].head()
    assert(id == 11L)
  }

  test("quantize maps min->0, max->2^bits-1, constants->0") {
    val out = Seq((0.0, 0.0, 10.0), (10.0, 0.0, 10.0), (5.0, 5.0, 5.0))
      .toDF("x", "mn", "mx")
      .select(Layout.quantize($"x", $"mn", $"mx", 4).as("q"))
      .as[Long].collect().toSeq
    assert(out == Seq(0L, 15L, 0L))
  }

  test("z-order files bound BOTH dimensions; single sort bounds one") {
    val ev = graft.io.Tables.table(spark, "/root/testdata/sf0.001",
      "events").select("event_id", "user_id", "value")
    def spans(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length >= 4, s"want >=4 files, got ${files.length}")
      val perFile = files.map { f =>
        spark.read.parquet(f)
          .agg((max("user_id") - min("user_id")).cast("double"),
            (max("value") - min("value")).cast("double"))
          .as[(Double, Double)].head()
      }
      (perFile.map(_._1).sum / perFile.length,
        perFile.map(_._2).sum / perFile.length)
    }
    val zdir = Files.createTempDirectory("zorder").toString
    val sdir = Files.createTempDirectory("sorted").toString
    Layout.writeZordered(ev, zdir, Seq("user_id", "value"),
      numFiles = 8)
    ev.repartitionByRange(8, $"user_id").sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sdir)
    val (zu, zv) = spans(zdir)
    val (su, sv) = spans(sdir)
    val (gu, gv) = ev.agg(
      (max("user_id") - min("user_id")).cast("double"),
      (max("value") - min("value")).cast("double"))
      .as[(Double, Double)].head()
    // single-key sort: tight on user_id but wide on value; z-order:
    // BOTH dims well below the global span and the value dim clearly
    // tighter than the single-key layout leaves it.
    assert(su < 0.3 * gu, s"sorted user span $su vs global $gu")
    assert(zu < 0.6 * gu, s"z user span $zu vs global $gu")
    assert(zv < 0.6 * gv, s"z value span $zv vs global $gv")
    assert(zv < 0.8 * sv, s"z value span $zv not tighter than sorted $sv")
    // both layouts keep the same rows
    val n = spark.read.parquet(zdir).count()
    assert(n == ev.count())
  }

  test("compact merges a fragmented sink, preserving every row") {
    val dir = Files.createTempDirectory("fragged").toString + "/t"
    val ev = graft.io.Tables.table(spark, "/root/testdata/sf0.001",
      "events").select("event_id", "user_id", "value")
    ev.repartition(37).write.parquet(dir) // simulate micro-batch litter
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 30)
    val sum0 = ev.agg(sum("event_id")).as[Long].head()
    val nOut = Layout.compact(spark, dir, targetFileBytes = 512L * 1024)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after == nOut && after < before, s"$before -> $after")
    val re = spark.read.parquet(dir)
    assert(re.count() == ev.count())
    assert(re.agg(sum("event_id")).as[Long].head() == sum0)
  }
}
