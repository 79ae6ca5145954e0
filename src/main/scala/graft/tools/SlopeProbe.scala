package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions

/** Scaling-slope probe for the graph-projection family: computes the
  * co-occurrence edge count and the PREDICTED wedge count
  * (Σ d·(d−1)/2 over the oriented degree table) at a given scale
  * factor WITHOUT executing the wedge join — on the synthetic uniform
  * bipartite data the projection is dense at every sf (shared-customer
  * weight λ = nCust·(degC/nSupp)² is scale-free), so edges grow ~n²
  * and wedges ~n³ with the supplier count. The probe quantifies that
  * regime cheaply; executing the wedge stream at sf ≥ 1 would be the
  * blowup itself. See SURVEY §5 (scaling slope) for the recorded
  * numbers and the 100 TB reading.
  *
  * Usage: `runMain graft.tools.SlopeProbe <sfDir>` (graph + ngram
  * analytics), or `<sfDir> lsh [bits]` / `<sfDir> minhash
  * [--survivors]` / `<sfDir> simhash [--spaces-only | --no-narrow]` /
  * `<sfDir> ngram` / `<sfDir> interval` (the registered interval
  * join's candidate volume via the production guard's estimate) /
  * `<sfDir> guardcost` (per-invocation cold/warm cost of the four
  * quadratic-path guard estimates — the r19-item-7 memoization A/B) /
  * `<sfDir> graph` (trade-graph-only analytics for
  * `--power-law` variant dirs, incl. the distinct-co-occurring-pairs
  * count whose ~linear-in-nSupp growth is the family's scale record) —
  * each mode appends its JSON line to `sweeps/sweep_<mode>.jsonl`
  * (SweepLog) as well as printing it.
  */
object SlopeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"), Sessions.shuffleParts(cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `<sfDir> lsh [bits]` — time the LSH pair join at a given bucket
    // width (default: bitsFor(n), the occupancy-held sizing) to show
    // scaled bits restore linear growth where the oracle-pinned bits=6
    // query goes quadratic (see Similarity.bitsFor).
    if (args.length > 1 && args(1) == "lsh") {
      val emb = graft.io.Tables.table(spark, sfDir, "embeddings")
      val n = emb.count()
      val bits = if (args.length > 2) args(2).toInt
        else graft.text.Similarity.bitsFor(n)
      def timePairs(b: Int): (Long, Double) = {
        val t = System.nanoTime()
        val rows = graft.text.Similarity.bucketedPairs(
          emb, "vec_id", "embedding", minCosine = 0.3,
          bits = b, dim = 64).count()
        (rows, (System.nanoTime() - t) / 1e9)
      }
      timePairs(bits) // warm codegen
      val (rows, sec) = timePairs(bits)
      SweepLog.append("lsh",
        s"""{"sf":"$sfDir","mode":"lsh","n":$n,"bits":$bits,""" +
        s""""pairs":$rows,"sec":$sec}""")
      spark.stop()
      return
    }
    // `<sfDir> minhash` — candidate-pair space of the registered
    // q_dedup_minhash banding (n=2, k=32, bands=8), analytically
    // (Σ C(count,2) per (band,bucket) — one aggregate, no join). On the
    // closed-vocab corpus the BASELINE Jaccard between unrelated docs is
    // high, so band collisions are not rare-random: this quantifies the
    // candidate stream the exact-Jaccard verification must then carry
    // doc-sized shingle arrays through.
    if (args.length > 1 && args(1) == "minhash") {
      val docs = graft.io.Tables.table(spark, sfDir, "documents")
      val sets = graft.text.Dedup.shingleSets(docs, "text", "doc_id", 2)
      val hashed = sets.filter(size(col("sh")) > 0)
        .select(col("doc_id"), graft.text.Dedup.baseHashes(col("sh"))
          .as("hs"))
        .cache()
      val n = hashed.count()
      val sigs = hashed.select(col("doc_id"),
        graft.text.Dedup.minhashSignature(col("hs"), 32).as("sig"))
      val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(7)),
          b => xxhash64(b, slice(col("sig"), b * 4 + 1, lit(4)))))
          .as(Seq("band", "bucket")))
      val space = banded.groupBy("band", "bucket")
        .agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0L))
          .cast("long")).head().getLong(0)
      // `--survivors`: also execute the two-stage prefilter (the
      // registered minAgree = 8-of-32 signature-estimate gate,
      // Dedup.minhashCandidatesEst) and count the DISTINCT candidates
      // that reach the exact shingle-array verification — the number
      // that must track output pairs, not the n²-ish band space, for
      // the attach joins to survive corpus scale. Costs the real band
      // join (streamed, sig-only payload), so it is opt-in where the
      // analytic space alone is wanted.
      val survivors = if (args.contains("--survivors")) {
        val c = graft.text.Dedup
          .minhashCandidatesEst(sigs, 32, 8, minAgree = 8).count()
        s""","prefilter_survivors":$c"""
      } else ""
      SweepLog.append("minhash",
        s"""{"sf":"$sfDir","mode":"minhash","n_docs":$n,""" +
        s""""band_candidate_pairs":$space$survivors}""")
      spark.stop()
      return
    }
    // `<sfDir> simhash` — candidate-pair space of the banded SimHash
    // schemes, analytically (Σ C(count,2) per band key — one aggregate,
    // no join): 64-bit/4×16-bit bands collide at random ~4·n²/2^16,
    // the 128-bit/4×32-bit wide form at ~4·n²/2^32. Quantifies why
    // q_dedup_simhash walled superlinear at gen-sf10 and why the wide
    // fingerprint is the corpus-scale path (Dedup.simhashWideTable).
    // `<sfDir> simhash [--spaces-only]` — with --spaces-only, print the
    // analytic candidate spaces (cheap aggregates) and skip the timed
    // pair joins: at gen-sf100 the 16-bit band space is ~240 B candidate
    // rows, so TIMING the narrow join is the blowup the numbers exist to
    // warn about (the blocked form's wall is benched separately as the
    // registered q_dedup_simhash). `--no-narrow` times the blocked and
    // wide joins but skips the narrow one — the 5M-doc decades where
    // blocked/wide are linear-in-output (tens of M candidates) while
    // the 16-bit space is 15 B+ pairs whose shuffle would ENOSPC the
    // sweep box; blocked = narrow output equality is asserted at the
    // decades where narrow runs, not here.
    if (args.length > 1 && args(1) == "simhash") {
      val spacesOnly = args.contains("--spaces-only")
      val noNarrow = args.contains("--no-narrow")
      val docs = graft.io.Tables.table(spark, sfDir, "documents")
      def pairSpace(banded: org.apache.spark.sql.DataFrame): Long =
        banded.groupBy("band", "key").agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0L))
            .cast("long")).head().getLong(0)
      val fp64 = graft.text.Dedup.simhashTable(docs, "text", "doc_id")
        .persist()
      val n = fp64.count()
      val b64 = fp64.select(explode(array((0 until 4).map(b => struct(
          lit(b).as("band"), shiftright(col("fp"), b * 16)
            .bitwiseAND(lit(65535L)).as("key"))): _*)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.key").as("key"))
      val p64 = pairSpace(b64)
      val fpW = graft.text.Dedup.simhashWideTable(docs, "text", "doc_id")
      val bW = fpW.select(explode(array((0 until 4).map { b =>
          val src = if (b < 2) col("fp_lo") else col("fp_hi")
          struct(lit(b).as("band"), shiftright(src, (b % 2) * 32)
            .bitwiseAND(lit(0xffffffffL)).as("key"))
        }: _*)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.key").as("key"))
      val pW = pairSpace(bW)
      // Candidate space of the blocked (Manku 56-table, 40-bit-key)
      // scheme — the REGISTERED q_dedup_simhash plan: Σ C(count,2)
      // over (tbl, key) groups, same analytic treatment. Expected
      // ∝ true near-dup pairs (+ ~56·n²/2^41 random floor), NOT
      // 4·n²/2^16.
      val combos = (0 until 8).combinations(5).toSeq
      val bB = fp64.select(explode(array(combos.zipWithIndex.map {
          case (blocks, tn) =>
            val key = blocks.zipWithIndex.map { case (blk, pos) =>
              shiftleft(shiftright(col("fp"), blk * 8)
                .bitwiseAND(lit(255L)), pos * 8)
            }.reduce((x, y) => x.bitwiseOR(y))
            struct(lit(tn).as("band"), key.as("key"))
        }: _*)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.key").as("key"))
      val pB = pairSpace(bB)
      if (spacesOnly) {
        SweepLog.append("simhash",
          s"""{"sf":"$sfDir","mode":"simhash","n_docs":$n,""" +
          s""""band16_candidate_pairs":$p64,""" +
          s""""band32_candidate_pairs":$pW,""" +
          s""""blocked_candidate_pairs":$pB}""")
        spark.stop()
        return
      }
      // end-to-end wall of both pair joins (verified pairs out): the
      // candidate-space ratio above predicts the wall gap. Each timed
      // run starts from a CLEARED cache so all three pipelines pay
      // their own fingerprinting (the Dedup builders cache their
      // fingerprint tables internally; narrow and blocked share
      // simhashTable's plan, wide has its own — an asymmetric warm-up
      // would exclude fingerprinting from some walls but not others).
      // JIT/codegen infrastructure is warmed by a neutral job instead
      // of a full narrow pair join (which at corpus scale IS the
      // quadratic blowup the probe exists to warn about).
      def timed(body: => org.apache.spark.sql.DataFrame): (Long, Double) = {
        spark.catalog.clearCache()
        val t = System.nanoTime()
        val rows = body.count()
        (rows, (System.nanoTime() - t) / 1e9)
      }
      spark.range(1000000L)
        .select(xxhash64(col("id")).as("h"))
        .groupBy(col("h") % 7).agg(count(lit(1))).count() // warm JIT
      val narrow = if (noNarrow) None else Some(timed(
        graft.text.Dedup.simhashPairs(docs, "text", "doc_id", 3)))
      val (rW, sW) = timed(
        graft.text.Dedup.simhashPairsWide(docs, "text", "doc_id", 3))
      // blocked form: same 64-bit fingerprint and output, 2^-40 keys
      val (rB, sB) = timed(
        graft.text.Dedup.simhashPairsBlocked(docs, "text", "doc_id", 3))
      val narrowJson = narrow.map { case (r64, s64) =>
        s""""narrow_pairs":$r64,"narrow_sec":$s64,""" }.getOrElse("")
      SweepLog.append("simhash",
        s"""{"sf":"$sfDir","mode":"simhash","n_docs":$n,""" +
        s""""band16_candidate_pairs":$p64,""" +
        s""""band32_candidate_pairs":$pW,""" +
        s""""blocked_candidate_pairs":$pB,""" +
        narrowJson +
        s""""wide_pairs":$rW,"wide_sec":$sW,""" +
        s""""blocked_pairs":$rB,"blocked_sec":$sB}""")
      spark.stop()
      return
    }
    // `<sfDir> graph` — ONLY the graph-projection analytics (reads
    // orders+lineitem, nothing else — runs on `--power-law` variant
    // dirs, which hold no documents; VERDICT r14 item 1). One heavy
    // join (the q_graph_degree/q_graph_triangles projection itself,
    // meanFactor = 1.08, maxDeg = 500 — Graph.coOccurrenceEdges'
    // internals inlined so `shared` is counted once instead of built
    // twice), plus cheap analytic aggregates:
    //   raw_pair_space     Σ C(deg_c, 2) over kept contexts — the
    //                      self-join's INPUT row count;
    //   distinct_pairs     count of distinct co-occurring (lo, hi) —
    //                      the groupBy's OUTPUT, i.e. the shuffle the
    //                      uniform corpus blew past 44 GB at gen-sf30.
    //                      On pl-* this must grow ~linearly in n_supp
    //                      (GenDataSpec pins < nSupp·(2·window+hubs)
    //                      at sf0.2; this records it at scale);
    //   n_edges / predicted_wedges  after the 1.08×mean threshold.
    if (args.length > 1 && args(1) == "graph") {
      val t0 = System.nanoTime()
      val cs = graft.io.Tables.table(spark, sfDir, "orders")
        .join(graft.io.Tables.table(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("i"))
        .distinct()
      val byCtx = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c"))
      val kept = cs.withColumn("deg", count(lit(1)).over(byCtx))
        .filter(col("deg") <= 500L).persist()
      val ctxStats = kept.groupBy("c").agg(max(col("deg")).as("d"))
        .agg(count(lit(1)).as("n_ctx"),
          coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0L))
            .cast("long").as("space"),
          coalesce(max(col("d")), lit(0L)).as("max_deg")).head()
      val nSupp = kept.select(col("i")).distinct().count()
      val p = kept.drop("deg")
      val shared = p.as("a").join(p.as("b"),
          col("a.c") === col("b.c") && col("a.i") < col("b.i"))
        .groupBy(col("a.i").as("lo"), col("b.i").as("hi"))
        .agg(count(lit(1)).as("shared")).persist()
      val distinctPairs = shared.count()
      val mu = shared.agg(
        (sum(col("shared")).cast("long").cast("double") /
          count(lit(1)).cast("double")).as("mu"))
      val edges = shared.crossJoin(broadcast(mu))
        .filter(col("shared").cast("double") >= lit(1.08) * col("mu"))
        .select(col("lo"), col("hi")).persist()
      val nEdges = edges.count()
      // wedge space under BOTH orientations, each analytically from a
      // degree table (never by executing the stream): id order is what
      // the pre-r15 triangleStats executed (8.81 B at pl-sf3 — the
      // blowup that killed the first sweep attempt); degree order is
      // what it executes now (65.7 M there, O(m^1.5) bound).
      def wedgeSum(d: org.apache.spark.sql.DataFrame): Long = d
        .agg(coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0L))
          .cast("long")).head().getLong(0)
      val wedgesId = wedgeSum(
        edges.groupBy("lo").agg(count(lit(1)).as("d")))
      val deg = edges.select(col("lo").as("node"))
        .unionAll(edges.select(col("hi").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val loFirst = col("dlo") < col("dhi") ||
        (col("dlo") === col("dhi") && col("lo") < col("hi"))
      val wedgesDeg = wedgeSum(edges
        .join(deg.select(col("node").as("lo"), col("d").as("dlo")), "lo")
        .join(deg.select(col("node").as("hi"), col("d").as("dhi")), "hi")
        .select(when(loFirst, col("lo")).otherwise(col("hi")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("d")))
      val sec = (System.nanoTime() - t0) / 1e9
      SweepLog.append("graph",
        s"""{"sf":"$sfDir","mode":"graph","n_supp":$nSupp,""" +
        s""""n_ctx":${ctxStats.getLong(0)},""" +
        s""""max_ctx_deg":${ctxStats.getLong(2)},""" +
        s""""raw_pair_space":${ctxStats.getLong(1)},""" +
        s""""distinct_pairs":$distinctPairs,"n_edges":$nEdges,""" +
        s""""wedges_id_orient":$wedgesId,""" +
        s""""wedges_deg_orient":$wedgesDeg,"sec":$sec}""")
      spark.stop()
      return
    }
    // `<sfDir> interval` — candidate-pair volume of the registered
    // interval-join pipeline (q_join_interval / q_join_interval_agg:
    // gap-sessionize events, error sessions × all concurrent sessions,
    // 3600 s bands — parameters mirror FeatureQueries.overlapPairs),
    // priced with the SAME estimate the production guard runs
    // (Relational.intervalJoinPairEstimate: two banded counts, one
    // tiny equi-join, one scalar sum — never the pair join itself).
    // The estimate prices the banded join's SHUFFLE-side work, which
    // both the pair-LIST query and its aggregate companion must
    // stream: it is the measured adjudication for excluding either
    // form at a decade where that stream exceeds the box's budget.
    if (args.length > 1 && args(1) == "interval") {
      val sessions = graft.ops.Relational
        .sessionize(graft.io.Tables.table(spark, sfDir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800)
        .groupBy("user_id", "session_idx")
        .agg(min(col("ts")).as("st"), max(col("ts")).as("en"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_err"))
        .persist()
      val nSessions = sessions.count()
      val a = sessions.filter(col("n_err") >= 1)
        .select(col("st").as("st_a"), col("en").as("en_a"))
      val nErr = a.count()
      val t0 = System.nanoTime()
      val est = graft.ops.Relational.intervalJoinPairEstimate(
        a, sessions.select(col("st").as("st_b"), col("en").as("en_b")),
        "st_a", "en_a", "st_b", "en_b", bucketSeconds = 3600L)
      val sec = (System.nanoTime() - t0) / 1e9
      sessions.unpersist()
      SweepLog.append("interval",
        s"""{"sf":"$sfDir","mode":"interval","n_sessions":$nSessions,""" +
        s""""n_error_sessions":$nErr,"candidate_pair_estimate":$est,""" +
        s""""estimate_sec":$sec}""")
      spark.stop()
      return
    }
    // `<sfDir> guardcost` — per-invocation overhead of the four
    // output-quadratic guards (VERDICT r19 item 7, measured-first):
    // each guarded constructor runs its scalar candidate-volume
    // estimate EAGERLY at plan-build time, every call — 3× per bench
    // query, every call in production. This mode times three
    // successive constructor invocations per guard exactly as the
    // registered queries make them (fresh DataFrame each time, so the
    // second/third hit only Spark's CacheManager canonical-plan dedup,
    // not any object-identity shortcut): call 1 = cold (persist
    // population + estimate), calls 2–3 = warm (what a guard-estimate
    // memo would save per extra bench iteration). The A/B verdict —
    // memoize or decline — reads off the warm column.
    if (args.length > 1 && args(1) == "guardcost") {
      def time3(body: => Unit): Seq[Double] = (1 to 3).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }
      val cap = Long.MaxValue // price, never refuse, in the probe
      // cooc: orders⋈lineitem → pruned+persisted relation → Σ C(deg,2)
      val cooc = time3 {
        val cs = graft.io.Tables.table(spark, sfDir, "orders")
          .join(graft.io.Tables.table(spark, sfDir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_suppkey"))
        graft.ops.Graph.coOccurrenceEdgesGuarded(cs, "o_custkey",
          "l_suppkey", meanFactor = 1.08, maxDeg = 500L, maxPairs = cap)
      }
      // interval: sessionize → persist → banded-count estimate
      val interval = time3 {
        val sessions = graft.ops.Relational
          .sessionize(graft.io.Tables.table(spark, sfDir, "events"),
            "user_id", "ts", "event_id", gapSeconds = 1800)
          .groupBy("user_id", "session_idx")
          .agg(min(col("ts")).as("st"), max(col("ts")).as("en"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_err"))
          .persist()
        val a = sessions.filter(col("n_err") >= 1)
          .select(col("user_id").as("user_a"),
            col("session_idx").cast("bigint").as("session_a"),
            col("st").as("st_a"), col("en").as("en_a"))
        val b = sessions
          .select(col("user_id").as("user_b"),
            col("session_idx").cast("bigint").as("session_b"),
            col("st").as("st_b"), col("en").as("en_b"))
        graft.ops.Relational.intervalJoinGuarded(
          a, b, "st_a", "en_a", "st_b", "en_b", bucketSeconds = 3600L,
          maxPairs = cap)
      }
      // ngram: shingle sets → persist → Σ C(df,2) posting estimate
      val ngram = time3 {
        graft.text.Dedup.ngramJaccardPairs(
          graft.io.Tables.table(spark, sfDir, "documents"),
          "text", "doc_id", n = 3, minJaccard = 0.2, maxDf = 10000L,
          maxPairs = cap)
      }
      // embed: n(n-1)/2 from one count()
      val embed = time3 {
        graft.text.Similarity.cosinePairsGuarded(
          graft.io.Tables.table(spark, sfDir, "embeddings"),
          "vec_id", "embedding", minCosine = 0.4, dim = 64,
          maxPairs = cap)
      }
      def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      SweepLog.append("guardcost",
        s"""{"sf":"$sfDir","mode":"guardcost",""" +
        s""""cooc_sec":${arr(cooc)},"interval_sec":${arr(interval)},""" +
        s""""ngram_sec":${arr(ngram)},"embed_sec":${arr(embed)}}""")
      spark.stop()
      return
    }
    // `<sfDir> ngram` — ONLY the n-gram-Jaccard candidate-space
    // analytics (the tail of the default mode, documents-only): lets
    // the probe run on `--open-vocab` variant dirs, which hold just
    // documents.parquet (GenData scaladoc) and have no trade graph.
    if (args.length > 1 && args(1) == "ngram") {
      val df = graft.text.Dedup.shingleSets(
          graft.io.Tables.table(spark, sfDir, "documents"),
          "text", "doc_id", n = 3)
        .select(explode(col("sh")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10000L)
      val ngram = df.agg(
          coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0L))
            .cast("long").as("pairs"),
          count(lit(1)).as("shingles"),
          max(col("df")).as("max_df"))
        .head()
      SweepLog.append("ngram",
        s"""{"sf":"$sfDir","mode":"ngram",""" +
        s""""ngram_candidate_pairs":${ngram.getLong(0)},""" +
        s""""ngram_distinct_shingles":${ngram.getLong(1)},""" +
        s""""ngram_max_df":${ngram.getLong(2)}}""")
      spark.stop()
      return
    }
    val t0 = System.nanoTime()
    val cs = graft.io.Tables.table(spark, sfDir, "orders")
      .join(graft.io.Tables.table(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
    val edges = graft.ops.Graph.coOccurrenceEdges(
      cs, "o_custkey", "l_suppkey", meanFactor = 1.08, maxDeg = 500L)
      .persist()
    val nEdges = edges.count()
    val predictedWedges = edges.groupBy("lo")
      .agg(count(lit(1)).as("d"))
      .agg(coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0L))
        .cast("long"))
      .head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    // Same analytic treatment for the exact n-gram Jaccard family:
    // candidate pairs = Σ_s C(df_s, 2) over the (maxDf-filtered)
    // shingle document frequencies — one aggregate, no join. On the
    // closed 30-word vocabulary the shingle space saturates, so df
    // grows ~linearly with the corpus and the pair space ~n².
    val df = graft.text.Dedup.shingleSets(
        graft.io.Tables.table(spark, sfDir, "documents"),
        "text", "doc_id", n = 3)
      .select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 10000L)
    val ngram = df.agg(
        coalesce(sum(col("df") * (col("df") - 1) / 2), lit(0L))
          .cast("long").as("pairs"),
        count(lit(1)).as("shingles"),
        max(col("df")).as("max_df"))
      .head()
    SweepLog.append("graph_ngram",
      s"""{"sf":"$sfDir","mode":"graph_ngram","n_edges":$nEdges,""" +
      s""""predicted_wedges":$predictedWedges,"edge_build_sec":$sec,""" +
      s""""ngram_candidate_pairs":${ngram.getLong(0)},""" +
      s""""ngram_distinct_shingles":${ngram.getLong(1)},""" +
      s""""ngram_max_df":${ngram.getLong(2)}}""")
    spark.stop()
  }
}
