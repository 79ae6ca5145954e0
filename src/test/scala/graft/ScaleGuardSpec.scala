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

  /** Queries whose CONSTRUCTION legitimately runs bounded driver-side
    * actions: memoized model/artifact builds (k-means quantizers, PQ
    * codebooks, dedup clustering, bucketed feature tables, sketch
    * builds, training loops) whose result is model-sized or written
    * back to distributed storage — never a corpus-sized collect.
    * Additions here need the same justification.
    */
  private val declaredBuilders: Set[String] = Set(
    "q_dedup_clusters", "q_dedup_survivors", "q_semantic_dedup",
    // (q_ann_recall left this list in r18: its coarse quantizer is now
    // the seeded ivfTopKSeeded — pure plan construction, no training)
    "q_similarity_ivf", "q_bandit_loop",
    "q_tfrecord_roundtrip", "q_feature_pit_bucketed",
    "q_media_meta", "q_media_features", "q_media_similarity",
    "q_frame_sample", "q_quantile_bin", "q_heavy_hitters",
    "q_pq_encode", "q_pq_adc", "q_kmeans_step", "q_logreg_step",
    "q_embed_centroids", "q_pipeline_e2e", "q_histogram",
    // one COUNT aggregate sizes the adaptive LSH bucket width
    // (Similarity.bitsFor) — a 1-scalar sizing pass, never a collect
    "q_embed_pairs_lsh_auto",
    // one SUM aggregate prices the candidate-pair volume BEFORE the
    // output-quadratic pair list launches (intervalJoinGuarded, VERDICT
    // r17 item 6) — a 1-scalar guard pass, band-count sized
    "q_join_interval",
    // r19 (VERDICT r18 item 3): the same 1-scalar guard pass extended
    // to the remaining output-quadratic family — n-gram posting
    // self-join (Σ C(df,2)), exact cosine all-pairs (one count), and
    // the co-occurrence projection (Σ C(deg,2), feeding both graph
    // queries through the memoized cosupply materialization)
    "q_dedup_ngram", "q_embed_pairs",
    "q_graph_degree", "q_graph_triangles")

  test("no query construction runs a driver-side action unless it is a " +
    "declared memoized builder (the round-3 collect scale-killer class)") {
    val sc = spark.sparkContext
    // An eager collect/count during query CONSTRUCTION surfaces as an
    // action job before any caller requests execution. Metadata jobs
    // (parquet footer/schema reads) are legitimate — tag each build
    // with a job group and blacklist action-shaped stages inside it.
    val actions = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.List[String]]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val group = if (js.properties == null) null
          else js.properties.getProperty("spark.jobGroup.id")
        if (group != null && group.startsWith("guard-build-"))
          js.stageInfos.foreach { si =>
            if (si.name.matches(
                "(collect|collectAsList|count|take|head|first) at .*"))
              actions.computeIfAbsent(group.stripPrefix("guard-build-"),
                _ => new java.util.concurrent.CopyOnWriteArrayList[String]()
              ).add(si.name)
          }
      }
    }
    sc.addSparkListener(listener)
    try {
      Queries.all.foreach { spec =>
        sc.setJobGroup(s"guard-build-${spec.name}", "scale guard", false)
        try {
          spec.fn(spark, dir).queryExecution.executedPlan
        } catch { case _: Throwable => () } // plan failures: other test
        finally sc.clearJobGroup()
      }
      Thread.sleep(2000) // listener bus is async
      import scala.jdk.CollectionConverters._
      val offenders = actions.asScala.view
        .filterKeys(!declaredBuilders.contains(_)).toMap
      assert(offenders.isEmpty,
        "undeclared driver-side actions during query construction:\n" +
          offenders.map { case (q, st) =>
            s"  $q: ${st.asScala.mkString(", ")}" }.mkString("\n"))
    } finally sc.removeSparkListener(listener)
  }

  test("q_embed_pairs plans the exact pair space as a broadcast " +
    "nested-loop join (not a driver-collected block loop)") {
    val plan = Queries.queries("q_embed_pairs")(spark, dir)
      .queryExecution.executedPlan
    val expanded = plan +: plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }
    val bnlj = expanded.flatMap(_.collect {
      case j: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => j
    })
    assert(bnlj.nonEmpty, s"expected BroadcastNestedLoopJoin in:\n$plan")
  }

  test("no query broadcasts a Generate (explode) output — the estimator " +
    "cannot size one (round-11 sf30 finding: every band/posting self-join " +
    "silently planned as BHJ of a corpus-scaling side, fatal at 8 GiB)") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // Catalyst's sizeInBytes for Generate passes through the un-exploded
    // child, so a broadcast decision over an exploded side is made on a
    // number unrelated to the broadcast's true size and cannot be trusted
    // at ANY scale — corpus pair joins must carry hint("merge") (or
    // shuffle_hash) instead. Checked on the initial AQE plan: join-side
    // hints survive AQE re-optimization, so planning-time shape holds.
    //
    // Exemptions: queries whose exploded broadcast side is BOUNDED by
    // construction (model-/probe-sized, never corpus-scaling), so the
    // mis-estimate is off by a known constant only. Additions here need
    // the same justification.
    val declaredBoundedExplodes: Set[String] = Set(
      // bandJoin's exploded side = supplier bands (×2 bucket
      // replication) joined to part pre-aggregated to distinct prices
      // — dim-shaped through the swept decades (~48 MB at gen-sf100,
      // measured linear 3.2×); ops/Relational.scala documents the
      // no-hint decision and points corpus-scaled band callers at
      // intervalJoin's always-shuffle form
      "q_join_range",
      // probe side = 20 query vectors × 9 multiprobe flips
      "q_similarity_multiprobe",
      // PQ codebook posexplode: k×m = 128 model cells
      "q_pq_encode", "q_pq_adc",
      // CMS sketch (depth×width = 4096 cells) and top-20 probe ×depth —
      // fixed-memory sketch state on both sides
      "q_heavy_hitters", "q_heavy_hitters_md5",
      // label-dimension posexplode, model-sized
      "q_confusion")
    val bad = Queries.all
      .filterNot(s => declaredBoundedExplodes.contains(s.name))
      .flatMap { spec =>
      try {
        val plan = spec.fn(spark, dir).queryExecution.executedPlan
        val expanded = plan +: plan.collect {
          case a: AdaptiveSparkPlanExec => a.executedPlan
        }
        expanded.flatMap(_.collect {
          case j: BroadcastHashJoinExec =>
            val build = j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
            build.collect { case g: GenerateExec => g }
              .map(g => s"${spec.name}: BroadcastHashJoin over " +
                s"${g.generator.getClass.getSimpleName} " +
                s"(keys ${j.leftKeys.map(_.sql).mkString(",").take(60)})")
        }.flatten)
      } catch { case _: Throwable => Seq.empty } // plan failures: other test
    }
    assert(bad.isEmpty, "exploded side under a broadcast:\n" +
      bad.mkString("\n"))
  }

  test("the merge hint on corpus pair joins survives AQE re-optimization " +
    "(final executed plan, not just the initial one)") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      SortMergeJoinExec}
    // The static test above checks the INITIAL adaptive plan; AQE
    // re-plans each stage at runtime and (absent a hint) would convert
    // the tiny sf0.001 SMJ to a broadcast join. Execute one blocked
    // SimHash pair join to completion and assert the FINAL plan still
    // sort-merges — i.e. the hint reached AQE's re-optimizer, so the
    // planning-time invariant holds at every scale, not just in the
    // pre-execution snapshot.
    val df = Queries.queries("q_dedup_simhash")(spark, dir)
    df.collect()
    // Materialized query stages are LEAF nodes — collect stops at stage
    // boundaries, so flatten them recursively to see the whole DAG.
    def deep(p: SparkPlan): Seq[SparkPlan] =
      p +: p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          deep(q.plan)
      }.flatten
    val finalPlans = df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.flatMap(deep)
    assert(finalPlans.nonEmpty, "expected an adaptive plan root")
    val smj = finalPlans.flatMap(_.collect { case j: SortMergeJoinExec => j })
    val bhjOverGenerate = finalPlans.flatMap(_.collect {
      case j: BroadcastHashJoinExec
        if j.collect { case g: GenerateExec => g }.nonEmpty => j
    })
    assert(smj.nonEmpty, "expected the pair join to stay sort-merge " +
      s"after AQE:\n${finalPlans.head}")
    assert(bhjOverGenerate.isEmpty,
      s"AQE converted a hinted pair join to broadcast:\n${finalPlans.head}")
  }

  test("the registered q_dedup_minhash plan carries the signature-estimate " +
    "prefilter (sig_agree) — the two-stage default; a silent fallback to " +
    "single-stage would reintroduce the gen-sf100 attach-join spill " +
    "(~600 GB, ENOSPC) that the prefilter cuts to ~35 GB") {
    val df = Queries.queries("q_dedup_minhash")(spark, dir)
    // The registered k=32 is divisible by 8, so the BYTE-PACKED gate
    // specifically must be in the plan — a silent revert to the
    // full-signature SigAgree would reintroduce the 8× band-sort
    // payload (the ov-sf100 premium this gate removed), so it fails
    // the pin too.
    val gate = df.queryExecution.optimizedPlan.collect {
      case node => node.expressions.flatMap(_.collect {
        case e: graft.functions.SigAgreeBytes => e
      })
    }.flatten
    assert(gate.nonEmpty,
      "expected the byte-packed prefilter (sig_agree_bytes) in " +
        s"q_dedup_minhash's optimized plan; two-stage packed default " +
        s"lost?\n${df.queryExecution.optimizedPlan}")
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
