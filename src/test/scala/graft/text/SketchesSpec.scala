package graft.text

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("cms estimate is exact for a stream with fewer items than cells") {
    val items = Seq("a", "a", "a", "b", "b", "c").toDF("term")
    val sketch = Sketches.cmsBuild(items, "term", depth, width)
    val est = Sketches.cmsEstimate(sketch,
        Seq("a", "b", "c", "zz").toDF("term"), "term", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") === 3L)
    assert(est("b") === 2L)
    assert(est("c") === 1L)
    // an item never inserted can only collide upward, never go negative
    assert(est("zz") >= 0L)
  }

  test("cms never undercounts on a zipf-ish stream") {
    // 30 distinct words, frequency ~ 1/rank, 465 occurrences total
    val ws = (1 to 30).flatMap(r => Seq.fill(31 - r)(s"w$r"))
    val df = ws.toDF("term")
    val sketch = Sketches.cmsBuild(df, "term", depth, width)
    val truth = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Sketches.cmsEstimate(sketch,
        truth.keys.toSeq.toDF("term"), "term", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = ws.size.toLong
    val eps = math.E / width
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"undercount for $t")
      assert(est(t) <= c + math.ceil(2 * eps * n).toLong,
        s"overcount for $t: est=${est(t)} true=$c n=$n")
    }
  }

  test("sketch size is bounded by depth x width regardless of stream") {
    val big = (1 to 2000).map(i => s"t$i").toDF("term")
    val cells = Sketches.cmsBuild(big, "term", depth, width).count()
    assert(cells <= (depth * width).toLong)
  }
}
