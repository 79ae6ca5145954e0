package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.{KMeans, LinUcb, LogReg, RankKFactorizer, Simulation}
import graft.text.Similarity

/** ML-adjacent operators (SURVEY.md §7 step 8): the LinUCB sufficient-
  * statistics aggregation gets a full DuckDB oracle via quantized-integer
  * arithmetic; the iterative ALS/training/scoring pipelines are rows-only
  * (not SQL-expressible) and covered by MlSpec instead.
  */
object MlQueries {

  /** Synthetic ratings derived from events (testdata has no ratings
    * table): item = hashed event_type, rating = value. Deterministic.
    */
  private def syntheticRatings(s: org.apache.spark.sql.SparkSession,
                               dir: String) =
    Q.t(s, dir, "events").select(
      col("user_id").cast(IntegerType).as("user_id"),
      pmod(xxhash64(col("event_type")), lit(50L)).cast(IntegerType)
        .as("item_id"),
      col("value").cast(FloatType).as("rating"))

  def specs: Seq[QuerySpec] = Seq(

    // -- LinUCB sufficient statistics, oracle-checked (A17 core) --------
    // Per action a: A_a = Σ x xᵀ and b_a = Σ r·x over quantized-integer
    // observations — the aggregation heart of LinUCB training, exact in
    // both engines. Output: one row per (action, part, i, j) cell.
    QuerySpec.sql("q_linucb_stats")(
      """WITH v AS (SELECT label AS action,
        |    list_transform(embedding[1:4],
        |      x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS x,
        |    CAST(floor(CAST(embedding[5] AS DOUBLE)*1e6) AS BIGINT) AS r
        |  FROM embeddings),
        |idx AS (SELECT unnest(range(4)) AS i),
        |xx AS (SELECT action, 'xx' AS part, a.i AS i, b.i AS j,
        |    CAST(sum(v.x[a.i+1] * v.x[b.i+1]) AS BIGINT) AS s
        |  FROM v, idx a, idx b GROUP BY action, a.i, b.i),
        |bx AS (SELECT action, 'bx' AS part, a.i AS i,
        |    CAST(-1 AS BIGINT) AS j,
        |    CAST(sum(v.r * v.x[a.i+1]) AS BIGINT) AS s
        |  FROM v, idx a GROUP BY action, a.i)
        |SELECT action, part, i, j, s
        |FROM (SELECT * FROM xx UNION ALL SELECT * FROM bx)
        |ORDER BY action, part, i, j""".stripMargin) { (s, dir) =>
      import s.implicits._
      val v = Q.t(s, dir, "embeddings").select(
        col("label").cast(IntegerType).as("action"),
        transform(slice(col("embedding"), 1, 4), Similarity.quant(_))
          .cast(ArrayType(DoubleType)).as("x"),
        Similarity.quant(element_at(col("embedding"), 5))
          .cast(DoubleType).as("reward"))
      val stats = LinUcb.sufficientStats(v, "action", "x", "reward", 4)
      val xx = stats.select(col("action"), lit("xx").as("part"),
          posexplode(col("stats.xx")).as(Seq("pos", "v")))
        .select(col("action"), col("part"),
          (col("pos") / 4).cast(LongType).as("i"),
          pmod(col("pos"), lit(4)).cast(LongType).as("j"),
          col("v").cast(LongType).as("s"))
      val bx = stats.select(col("action"), lit("bx").as("part"),
          posexplode(col("stats.bx")).as(Seq("pos", "v")))
        .select(col("action"), col("part"),
          col("pos").cast(LongType).as("i"), lit(-1L).as("j"),
          col("v").cast(LongType).as("s"))
      xx.unionByName(bx).orderBy("action", "part", "i", "j")
    },

    // -- per-label embedding centroids: vector mean via posexplode +
    // one (label, dim) aggregate — the columnar way to average vectors
    // (map-side combinable; a collect-and-average would ship every
    // vector to one place). Quantized sums keep the oracle exact; the
    // mean is one final IEEE division ------------------------------------
    QuerySpec.sql("q_embed_centroids")(
      """WITH e AS (SELECT label, u.i AS dim,
        |    CAST(floor(CAST(embedding[u.i + 1] AS DOUBLE) * 1e6)
        |      AS BIGINT) AS q
        |  FROM embeddings, unnest(range(0, len(embedding))) AS u(i)),
        |g AS (SELECT label, CAST(dim AS BIGINT) AS dim,
        |        CAST(sum(q) AS BIGINT) AS sum_q,
        |        count(*) AS n
        |      FROM e GROUP BY 1, 2)
        |SELECT label, dim, sum_q, n,
        |  CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q
        |FROM g ORDER BY label, dim""".stripMargin) { (s, dir) =>
      Q.t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim").cast(LongType).as("dim"),
          floor(col("v").cast(DoubleType) * 1e6).cast(LongType).as("q"))
        .groupBy("label", "dim")
        .agg(sum("q").cast(LongType).as("sum_q"),
          count(lit(1)).as("n"))
        .select(col("label"), col("dim"), col("sum_q"), col("n"),
          (col("sum_q").cast(DoubleType) / col("n").cast(DoubleType))
            .as("mean_q"))
        .orderBy("label", "dim")
    },

    // -- one deterministic k-means Lloyd step (semantic clustering for
    // corpus dedup/sampling): exact quantized-integer distances, exact
    // integer dim-sums, one IEEE division per mean — oracle-checked ----
    QuerySpec.sql("q_kmeans_step")(
      """WITH v AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv,
        |    x -> x*x)) AS BIGINT) AS n2 FROM v),
        |c AS (SELECT vec_id AS cid, qv AS cv, n2 AS c2 FROM n
        |      WHERE vec_id < 8),
        |d AS (SELECT n.vec_id, c.cid, n.n2 + c.c2 -
        |        2*CAST(list_sum(list_transform(range(1, 65),
        |          i -> n.qv[i]*c.cv[i])) AS BIGINT) AS dist2
        |      FROM n, c),
        |a AS (SELECT vec_id, cid FROM (
        |        SELECT vec_id, cid, row_number() OVER (
        |          PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM d)
        |      WHERE rn = 1)
        |SELECT a.cid AS cluster_id, r.range AS dim,
        |       count(*) AS n,
        |       CAST(CAST(sum(v.qv[r.range]) AS BIGINT) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE) AS mean_q
        |FROM a JOIN v USING (vec_id), range(1, 65) r
        |GROUP BY 1, 2 ORDER BY cluster_id, dim""".stripMargin) { (s, dir) =>
      KMeans.step(Q.t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
        .orderBy("cluster_id", "dim")
    },

    // -- semantic dedup: one doc kept per k-means cluster (the
    // embedding-space analogue of q_dedup_survivors) --------------------
    QuerySpec.sql("q_semantic_dedup")(
      """WITH v AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv,
        |    x -> x*x)) AS BIGINT) AS n2 FROM v),
        |c AS (SELECT vec_id AS cid, qv AS cv, n2 AS c2 FROM n
        |      WHERE vec_id < 8),
        |d AS (SELECT n.vec_id, c.cid, n.n2 + c.c2 -
        |        2*CAST(list_sum(list_transform(range(1, 65),
        |          i -> n.qv[i]*c.cv[i])) AS BIGINT) AS dist2
        |      FROM n, c),
        |a AS (SELECT vec_id, cid FROM (
        |        SELECT vec_id, cid, row_number() OVER (
        |          PARTITION BY vec_id ORDER BY dist2, cid) AS rn FROM d)
        |      WHERE rn = 1)
        |SELECT cid AS cluster_id, min(vec_id) AS rep_id,
        |       count(*) AS n_members
        |FROM a GROUP BY 1 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
      val q = Q.t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantVec(col("embedding"))
          .as("qv"))
      val cents = q.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("qv").as("cv"))
      KMeans.assignQuant(q, cents, "vec_id")
        .groupBy("cluster_id")
        .agg(min(col("vec_id")).as("rep_id"),
          count(lit(1)).as("n_members"))
        .orderBy("cluster_id")
    },

    // -- quality-classifier gradient (logistic regression, first batch
    // step from w=0 → sigmoid(0)=½ exact → pure integer sums) ----------
    QuerySpec.sql("q_logreg_step")(
      """WITH v AS (SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (SELECT count(*) AS n FROM v),
        |g AS (SELECT r.range AS dim,
        |        CAST(sum(qv[r.range]*(1 - 2*y)) AS BIGINT) AS grad_sum
        |      FROM v, range(1, 65) r GROUP BY 1)
        |SELECT dim, grad_sum,
        |       CAST(-0.1 AS DOUBLE) * (CAST(grad_sum AS DOUBLE) /
        |         CAST(2*1000000*n.n AS DOUBLE)) AS w1
        |FROM g, n ORDER BY dim""".stripMargin) { (s, dir) =>
      LogReg.gradStep(
        Q.t(s, dir, "embeddings")
          .withColumn("quality", when(col("label") < 5, 1L).otherwise(0L)),
        "embedding", "quality", lr = 0.1)
        .orderBy("dim")
    },

    // -- classifier evaluation: AUC as the Mann–Whitney rank-sum over
    // the exact-integer one-step logit (ties broken by vec_id — a
    // deterministic total order both engines rank identically) ---------
    QuerySpec.sql("q_classifier_auc")(
      """WITH v AS (SELECT vec_id,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS qv
        |  FROM embeddings),
        |g AS (SELECT r.range AS dim,
        |        CAST(sum(qv[r.range]*(1 - 2*y)) AS BIGINT) AS gsum
        |      FROM v, range(1, 65) r GROUP BY 1),
        |s AS (SELECT v.vec_id, v.y,
        |        CAST(sum(qv[g.dim] * -g.gsum) AS BIGINT) AS score
        |      FROM v, g GROUP BY 1, 2),
        |r AS (SELECT y, row_number() OVER (ORDER BY score, vec_id)
        |        AS rnk FROM s),
        |agg AS (SELECT CAST(sum(CASE WHEN y = 1 THEN rnk ELSE 0 END)
        |          AS BIGINT) AS pos_ranksum,
        |          CAST(sum(y) AS BIGINT) AS n_pos,
        |          CAST(count(*) - sum(y) AS BIGINT) AS n_neg FROM r)
        |SELECT n_pos, n_neg,
        |  (CAST(pos_ranksum AS DOUBLE) -
        |    CAST(n_pos*(n_pos+1)/2 AS DOUBLE)) /
        |    CAST(n_pos*n_neg AS DOUBLE) AS auc
        |FROM agg""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val scored = LogReg.intScore(
        Q.t(s, dir, "embeddings")
          .withColumn("quality", when(col("label") < 5, 1L).otherwise(0L)),
        "vec_id", "embedding", "quality")
      // Global rank over (score, id): the ranked table is one aggregate
      // away from a 3-number output, so a single-partition window is
      // NOT the q_zip_position trap — but Relational.zipIndex gives the
      // same total order partition-parallel; use it for the rank.
      val ranked = graft.ops.Relational.zipIndex(
        scored.select(col("y"), col("score"), col("vec_id")),
        Seq(col("score"), col("vec_id")), "idx0")
        .withColumn("rnk", col("idx0") + 1)
      ranked.agg(
          sum(when(col("y") === 1, col("rnk")).otherwise(0L))
            .cast(LongType).as("pos_ranksum"),
          sum(col("y")).cast(LongType).as("n_pos"),
          (count(lit(1)) - sum(col("y"))).cast(LongType).as("n_neg"))
        .select(col("n_pos"), col("n_neg"),
          ((col("pos_ranksum").cast(DoubleType) -
            (col("n_pos") * (col("n_pos") + 1) / 2).cast(DoubleType)) /
            (col("n_pos") * col("n_neg")).cast(DoubleType)).as("auc"))
    },

    // -- confusion matrix + precision/recall/F1 at threshold 0 over the
    // same integer logit: counts are exact, ratios single IEEE divs ----
    QuerySpec.sql("q_confusion")(
      """WITH v AS (SELECT vec_id,
        |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE)*1e6) AS BIGINT)) AS qv
        |  FROM embeddings),
        |g AS (SELECT r.range AS dim,
        |        CAST(sum(qv[r.range]*(1 - 2*y)) AS BIGINT) AS gsum
        |      FROM v, range(1, 65) r GROUP BY 1),
        |s AS (SELECT v.vec_id, v.y,
        |        CAST(sum(qv[g.dim] * -g.gsum) AS BIGINT) AS score
        |      FROM v, g GROUP BY 1, 2),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN y=1 AND score>0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN y=0 AND score>0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN y=0 AND score<=0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN y=1 AND score<=0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn FROM s)
        |SELECT tp, fp, tn, fn,
        |  CAST(tp AS DOUBLE)/CAST(tp+fp AS DOUBLE) AS precision_,
        |  CAST(tp AS DOUBLE)/CAST(tp+fn AS DOUBLE) AS recall_,
        |  CAST(2*tp AS DOUBLE)/CAST(2*tp+fp+fn AS DOUBLE) AS f1
        |FROM c""".stripMargin) { (s, dir) =>
      val scored = LogReg.intScore(
        Q.t(s, dir, "embeddings")
          .withColumn("quality", when(col("label") < 5, 1L).otherwise(0L)),
        "vec_id", "embedding", "quality")
      scored.agg(
          sum(when(col("y") === 1 && col("score") > 0, 1L).otherwise(0L))
            .cast(LongType).as("tp"),
          sum(when(col("y") === 0 && col("score") > 0, 1L).otherwise(0L))
            .cast(LongType).as("fp"),
          sum(when(col("y") === 0 && col("score") <= 0, 1L).otherwise(0L))
            .cast(LongType).as("tn"),
          sum(when(col("y") === 1 && col("score") <= 0, 1L).otherwise(0L))
            .cast(LongType).as("fn"))
        .select(col("tp"), col("fp"), col("tn"), col("fn"),
          (col("tp").cast(DoubleType) /
            (col("tp") + col("fp")).cast(DoubleType)).as("precision_"),
          (col("tp").cast(DoubleType) /
            (col("tp") + col("fn")).cast(DoubleType)).as("recall_"),
          ((lit(2L) * col("tp")).cast(DoubleType) /
            (lit(2L) * col("tp") + col("fp") + col("fn"))
              .cast(DoubleType)).as("f1"))
    },

    // -- full bandit loop: ALS env → simulate → train → score (A12/A17/
    // A19; rows-only — iterative MLlib pipeline) ------------------------
    QuerySpec.rowsOnly("q_bandit_loop") { (s, dir) =>
      val ratings = syntheticRatings(s, dir)
      val factors = RankKFactorizer.factorize(ratings, rank = 8,
        seed = 42L, maxIter = 5)
      // fused transition stream (nest∘flatten elided — identical
      // multiset, see Simulation.transitions; the nested interchange
      // form is exercised by q_tfrecord_roundtrip and MlSpec)
      val traj = Simulation.transitions(s, factors,
        steps = 50, batchSize = 8, numActions = 20, seed = 42L)
      // cached: feeds both the training pass and the scoring pass —
      // without it the whole simulation DAG re-executes for scoring.
      // (localCheckpoint was A/B'd r16: no gain — the per-execution
      // cost is fixed exec/agg machinery, not lineage re-analysis —
      // and checkpoint blocks are non-replayable on executor loss.)
      val flat = traj.cache()
      val model = LinUcb.fit(flat, "action", "obs", "reward", dim = 8,
        alpha = 0.5, lambda = 1.0)
      LinUcb.score(model, flat, "obs")
        .groupBy("predicted_action")
        .agg(count(lit(1)).as("n"),
          sum(col("reward").cast(DecimalType(18, 6))).cast(DoubleType)
            .as("sum_reward"))
        .orderBy("predicted_action")
    },

    // -- TFRecord interchange (A8/A9/A16 with REAL bytes; rows-only —
    // the byte formats are not DuckDB-expressible) ----------------------
    // Trajectories round-trip through the reference's on-disk format
    // (Example ∋ serialized TensorProtos, TFRecord framing); the output
    // aggregates the decoded records so every decode path executes.
    QuerySpec.rowsOnly("q_tfrecord_roundtrip") { (s, dir) =>
      import graft.io.TfRecords
      val ratings = syntheticRatings(s, dir)
      val factors = RankKFactorizer.factorize(ratings, rank = 4,
        seed = 42L, maxIter = 3)
      val traj = Simulation.generateTrajectories(s, factors,
        steps = 20, batchSize = 4, numActions = 10, seed = 42L)
      val out = java.nio.file.Files
        .createTempDirectory("graft_tfrec").toString
      TfRecords.writeTrajectories(traj, out)
      // flatten: records have no step column (the reference's Example
      // doesn't carry one), so explode (action, reward) pairs directly
      TfRecords.readTrajectories(s, out).toDF()
        .select(explode(arrays_zip(col("action"), col("reward")))
          .as("t"))
        .select(col("t.action").as("action"),
          col("t.reward").as("reward"))
        .groupBy("action")
        .agg(count(lit(1)).as("n"),
          sum(col("reward").cast(DecimalType(18, 6))).cast(DoubleType)
            .as("sum_reward"))
        .orderBy("action")
    }
  )
}
