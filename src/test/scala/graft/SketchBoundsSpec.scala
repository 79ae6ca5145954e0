package graft

import org.apache.spark.sql.functions._

/** Error-bound specs for the two approximate registered queries that
  * have no DuckDB oracle (sketch hashing is not cross-engine
  * expressible). Rows-only driver checks prove the queries RUN; these
  * pin the quantitative guarantees on the real testdata so the
  * approximations cannot silently drift.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_agg_approx: HLL estimate within 3x the declared rsd of the " +
    "exact distinct count per group") {
    val approx = Queries.queries("q_agg_approx")(spark, dir)
      .select(col("l_returnflag"), col("approx_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Q.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr <= 3 * 0.02,
        s"group $flag: approx=$ap exact=$ex relErr=$relErr")
    }
  }

  test("q_heavy_hitters: CMS never undercounts and overcount stays " +
    "under the eps*N sketch bound on the registered query's output") {
    val rows = Queries.queries("q_heavy_hitters")(spark, dir)
      .select(col("term"), col("true_cnt"), col("cms_est"))
      .collect()
    assert(rows.length == 20)
    val totalTokens = Q.t(spark, dir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
      .count()
    // CMS guarantee: est >= true always; est <= true + e/width * N with
    // prob 1 - e^-depth per query. Data is fixed, so the loose 3x bound
    // is a deterministic regression pin, not a probabilistic gamble.
    val maxOver = 3.0 * math.E / 1024.0 * totalTokens
    rows.foreach { r =>
      val (term, tc, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= tc, s"$term: CMS undercounted ($est < $tc)")
      assert(est - tc <= maxOver,
        s"$term: overcount ${est - tc} exceeds bound $maxOver")
    }
  }
}
