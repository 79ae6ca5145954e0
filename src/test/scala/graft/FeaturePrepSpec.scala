package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the feature-prep queries. The DuckDB oracle
  * proves Spark and DuckDB compute the SAME thing; these prove the
  * thing computed is the op each query claims to be — a wrong formula
  * implemented identically on both engines would pass the oracle but
  * fail here.
  */
class FeaturePrepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_impute_mean: output has no null imputed values, non-null " +
    "inputs pass through, and fills equal the per-group mean") {
    val out = Queries.queries("q_impute_mean")(spark, dir).cache()
    assert(out.filter(col("imputed_cents").isNull).count() == 0)
    assert(out.filter(!col("was_imputed") &&
      col("imputed_cents") =!= col("value_cents")).count() == 0)
    // every imputed row of a type carries one value: floor(type mean)
    val fills = out.filter(col("was_imputed"))
      .select("event_type", "imputed_cents").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val means = out.filter(!col("was_imputed"))
      .groupBy("event_type")
      .agg(floor(sum(col("value_cents").cast("decimal(38,0)"))
          .cast("double") / count(lit(1)).cast("double"))
        .cast("bigint").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fills.foreach { case (t, v) =>
      means.get(t) match {
        case Some(m) => assert(v == m, s"type $t filled $v, mean is $m")
        case None => fail(s"type $t has NO non-null values — the query " +
          "would emit NULL imputed_cents, which the null-check above " +
          "must already have caught")
      }
    }
  }

  test("q_winsorize: clipped values lie inside [p05, p95], unclipped " +
    "values are unchanged, and clipping is the only transformation") {
    val out = Queries.queries("q_winsorize")(spark, dir).cache()
    assert(out.count() > 0)
    val bad = out.filter(
      (col("was_clipped") && col("clipped_cents") === col("value_cents"))
        || (!col("was_clipped") &&
          col("clipped_cents") =!= col("value_cents")))
    assert(bad.count() == 0)
    // all clipped outputs are a group boundary: exactly the min/max of
    // the clipped column within the group
    val bounds = out.groupBy("event_type")
      .agg(min("clipped_cents").as("lo"), max("clipped_cents").as("hi"))
    val outside = out.join(bounds, "event_type")
      .filter(col("clipped_cents") < col("lo") ||
        col("clipped_cents") > col("hi"))
    assert(outside.count() == 0)
  }

  test("q_scale_minmax: scaled values lie in [0,1] and each group " +
    "attains both endpoints") {
    val out = Queries.queries("q_scale_minmax")(spark, dir).cache()
    assert(out.filter(col("scaled") < 0.0 || col("scaled") > 1.0)
      .count() == 0)
    val endpoints = out.groupBy("event_type")
      .agg(min("scaled").as("lo"), max("scaled").as("hi"))
      .collect()
    endpoints.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0,
        s"group ${r.getString(0)}: range [${r.getDouble(1)}, " +
          s"${r.getDouble(2)}] != [0,1]")
    }
  }

  test("q_feature_hash: buckets are in [0,64), deterministic, and " +
    "equal categories always share a bucket") {
    val out = Queries.queries("q_feature_hash")(spark, dir).cache()
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 64)
      .count() == 0)
    // one bucket per category (functional dependency cat -> bucket)
    val multi = out.select("cat", "bucket").distinct()
      .groupBy("cat").agg(countDistinct("bucket").as("n"))
      .filter(col("n") > 1)
    assert(multi.count() == 0)
  }

  test("q_target_encode: every encoding lies strictly between the " +
    "group mean and the global mean (shrinkage property)") {
    val out = Queries.queries("q_target_encode")(spark, dir)
    val y = Q.t(spark, dir, "orders").select(col("o_orderpriority"),
      round(col("o_totalprice") * 100).cast("bigint").as("y"))
    val gmean = y.agg(sum(col("y").cast("decimal(38,0)")).cast("double")
        / count(lit(1)).cast("double")).head().getDouble(0)
    val gm = y.groupBy("o_orderpriority")
      .agg((sum(col("y").cast("decimal(38,0)")).cast("double")
        / count(lit(1)).cast("double")).as("mean"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val encs = out.select("o_orderpriority", "target_enc").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    encs.foreach { case (p, e) =>
      val lo = math.min(gm(p), gmean) - 1e-9
      val hi = math.max(gm(p), gmean) + 1e-9
      assert(e >= lo && e <= hi,
        s"priority $p: enc $e outside [${gm(p)}, $gmean]")
    }
  }
}
