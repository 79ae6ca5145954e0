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

  test("q_hll_md5: the hand-rolled cross-engine HLL estimate lands " +
    "within 3 standard errors (1.04/sqrt(64)) of the exact count") {
    val rows = Queries.queries("q_hll_md5")(spark, dir)
      .select("l_returnflag", "exact_parts", "hll_est")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ex = r.getLong(1)
      val est = r.getDouble(2)
      val relErr = math.abs(est - ex) / ex
      assert(relErr <= 3 * 1.04 / 8,
        s"group ${r.getString(0)}: est=$est exact=$ex relErr=$relErr")
    }
  }

  test("q_quantiles_approx: each sketch quantile lands within the " +
    "declared rank-error bound of the exact order statistics") {
    val approx = Queries.queries("q_quantiles_approx")(spark, dir)
      .select("l_returnflag", "q25", "q50", "q90")
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exactVals = Q.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == exactVals.keySet)
    for {
      (flag, qs) <- approx
      (p, got) <- Seq(0.25, 0.5, 0.9).zip(qs)
    } {
      val sorted = exactVals(flag)
      val n = sorted.length
      // accuracy=10000 guarantees rank error <= n/10000 (+1 slack for
      // the discrete target-rank convention)
      val eps = n / 10000 + 1
      val target = math.ceil(p * n).toInt
      val lo = sorted(math.max(target - 1 - eps, 0))
      val hi = sorted(math.min(target - 1 + eps, n - 1))
      assert(got >= lo && got <= hi,
        s"group $flag p=$p: approx=$got outside [$lo,$hi] (n=$n)")
    }
  }

  test("q_quantiles_hist: the grid-histogram inverse-CDF quantile is " +
    "the exact quantile rounded DOWN to its $100 bin edge") {
    val hist = Queries.queries("q_quantiles_hist")(spark, dir)
      .select("l_returnflag", "q25_cents", "q50_cents", "q90_cents")
      .collect().map(r => r.getString(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exactVals = Q.t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(hist.keySet == exactVals.keySet)
    for {
      (flag, qs) <- hist
      (p, got) <- Seq(25, 50, 90).zip(qs)
    } {
      val sorted = exactVals(flag)
      val n = sorted.length
      // ceil(p*n/100) in exact integer arithmetic, 1-indexed rank
      val exact = sorted(((n.toLong * p + 99) / 100 - 1).toInt)
      // the estimate is the LOWER edge of the bin holding the exact
      // order statistic: exact - width < est <= exact, est ≡ 0 (mod w)
      assert(got % 10000 == 0, s"$flag p=$p: $got not a bin edge")
      assert(got <= exact && exact - got < 10000,
        s"group $flag p=$p: hist=$got exact=$exact")
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
