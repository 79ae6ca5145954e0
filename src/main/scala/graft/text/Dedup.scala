package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.types._

import graft.Hints.MergeHintOps

/** Near-duplicate detection: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): nothing here ever materializes the n² pair
  * space. Candidate pairs come from equality joins on discrete keys
  * (shingle postings, MinHash band buckets, SimHash bands) — each is a
  * plain shuffle-on-key join Catalyst/AQE handles, with skew bounded by
  * dropping ultra-common postings (`maxDf`). Verification re-joins the
  * per-doc shingle sets only for the surviving candidates.
  *
  * Caching contract: the pair builders (`minhashPairs`, `simhashPairs`,
  * `simhashPairsBlocked`, `simhashPairsWide`) `cache()` their
  * fingerprint/shingle intermediates — the self-join reads each twice —
  * and do NOT unpersist them (the returned DataFrame is lazy; the
  * intermediate must outlive this call). Callers running many pipelines
  * in one session (e.g. SlopeProbe) should `spark.catalog.clearCache()`
  * between them.
  *
  * Join strategy: every corpus×corpus join here carries an explicit
  * `hint("merge")`. The band/posting sides are Generate (explode)
  * outputs whose size estimate passes through the un-exploded child, so
  * Catalyst auto-broadcasts them — silently at small scale, fatally at
  * corpus scale (the gen-sf30 sweep caught the 56-way blocked-SimHash
  * band table failing the 8 GiB broadcast limit; at gen-sf10 the same
  * plan had silently broadcast 2.8 GB). SMJ is the plan correct stats
  * would produce; AQE still applies skew-split and partition coalescing
  * to the shuffles.
  */
object Dedup {

  /** Exact dedup groups via content hash: (hash, keep_id = min id,
    * n_dups). Deterministic survivor — dropDuplicates picks an arbitrary
    * row per partition-race (SURVEY.md §5).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.contentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Per-doc distinct word-n-gram shingle sets. Tokens materialize as a
    * real column in a separate projection BEFORE the shingle lambda:
    * element_at over an attribute is an O(1) array read, whereas an
    * inline `split(text)` child would be re-evaluated on every lambda
    * invocation (~3n re-splits per doc) — CollapseProject keeps the two
    * projections apart because the token expression is non-cheap and
    * multiply-referenced.
    */
  def shingleSets(df: DataFrame, textCol: String, idCol: String,
                  n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks"), n).as("sh"))

  /** All pairs with n-gram Jaccard >= minJaccard — EXACT result via an
    * inverted index: each shared shingle contributes exactly one row to
    * the posting-list self-join, so |a ∩ b| is a plain groupBy-count over
    * the join output and |a ∪ b| = |a| + |b| − |a ∩ b| from the cached
    * set sizes. No n² pair space, no distinct(), no array re-intersect.
    *
    * A size filter inside the join prunes hopeless pairs before the
    * aggregation: jaccard >= t forces t·max(|a|,|b|) <= min(|a|,|b|)
    * (checked with a 0.5 slack so double rounding can never drop an
    * exact-boundary pair — sizes are integers).
    *
    * Scale: one shuffle on the shingle key (AQE splits skewed common
    * shingles), map-side partial counts collapse the pair stream. Pick n
    * so the shingle vocabulary is large relative to the corpus (word
    * trigrams for prose); low-entropy vocabularies degrade any exact
    * scheme toward n² and are what [[minhashPairs]] is for.
    *
    * `maxDf` is the skew guard: shingles appearing in more than maxDf
    * documents are dropped from the posting lists BEFORE the self-join —
    * one viral stop-phrase shingle otherwise contributes df² join rows
    * (quadratic blowup at 100 TB). The document frequency is computed
    * with a window count partitioned by the shingle itself, so it rides
    * the same hash-partitioning the self-join needs — no extra shuffle
    * shape. RECALL CONTRACT: a pruned shingle is invisible to both
    * n_inter and candidate generation, so a pair is missed (or its
    * jaccard undercounted) only if its overlap depends on shingles
    * shared by > maxDf docs; with maxDf far above the expected
    * duplicate-cluster size the result is exact. Default = no pruning.
    *
    * `maxPairs` (default unguarded) prices the posting self-join's
    * exact candidate volume Σ C(df_s, 2) first and throws loudly past
    * the cap — the VERDICT-r18 guard pattern; `guardHint` is appended
    * to the over-cap message by callers that know their registered
    * companion query / cap env var (the generic layer names neither).
    *
    * Output: (doc_a, doc_b, n_inter, n_union, jaccard), doc_a < doc_b.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int, minJaccard: Double,
                        maxDf: Long = Long.MaxValue,
                        maxPairs: Long = Long.MaxValue,
                        guardHint: String = ""): DataFrame = {
    // Persisted: the set table is tiny relative to the corpus (ids +
    // shingle arrays) and feeds BOTH sides of the self-join — without it
    // each side re-tokenizes the full corpus. The 100 TB analogue is
    // materializing the shingle table once before the join stage.
    val sized = shingleSets(df, textCol, idCol, n)
      .select(col("doc_id"), col("sh"),
        size(col("sh")).cast(LongType).as("sz"))
      .filter(col("sz") > 0)
      .persist()
    val allPosts = sized.select(col("doc_id"), col("sz"),
      explode(col("sh")).as("s"))
    val posts =
      if (maxDf == Long.MaxValue) allPosts
      else {
        val byShingle =
          org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
        allPosts.withColumn("df", count(lit(1)).over(byShingle))
          .filter(col("df") <= maxDf)
          .drop("df")
      }
    // Candidate-volume guard (VERDICT r18 item 3 — the
    // intervalJoinGuarded pattern): the posting self-join streams
    // Σ C(df_s, 2) rows over the surviving shingles, exact — every
    // in-posting (x < y) pair reaches the pre-aggregate stream (the
    // size filter prunes AFTER the join pairs them). A low-entropy
    // vocabulary degrades that toward n² by semantics, so past
    // `maxPairs` this REFUSES at plan-build time (one map-side-combined
    // groupBy over the cached set table, double-summed and saturated
    // per Caps.saturate) instead of dying by spill mid-join. The banded
    // MinHash form (minhashPairs) is the corpus-scale companion.
    if (maxPairs != Long.MaxValue) {
      // Memoized per canonical plan of `posts` (Caps.memoizedEstimate —
      // VERDICT r19 item 7; the plan embeds the maxDf pruning, so a
      // different maxDf prices fresh). The CAP comparison below still
      // runs per call.
      val est = graft.ops.Caps.memoizedEstimate(posts, "ngram") {
        val r = posts.groupBy("s")
          .agg(count(lit(1)).cast(DoubleType).as("d"))
          .agg(sum(col("d") * (col("d") - 1) / 2)).collect()(0)
        if (r.isNullAt(0)) 0L else graft.ops.Caps.saturate(r.getDouble(0))
      }
      if (est > maxPairs) throw new IllegalStateException(
        s"n-gram posting-pair estimate $est exceeds maxPairs $maxPairs: " +
          "the exact inverted-index self-join is output-quadratic on " +
          "low-entropy vocabularies and this corpus would spill, not " +
          "stream. Use a banded approximate companion (MinHash-LSH) at " +
          "corpus scale, tighten maxDf, or raise the cap deliberately." +
          (if (guardHint.nonEmpty) " " + guardHint else ""))
    }
    val inter = posts.as("x").mergeHint.join(
        posts.as("y").mergeHint,
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
          col("y.sz") >= col("x.sz") * minJaccard - 0.5 &&
          col("x.sz") >= col("y.sz") * minJaccard - 0.5)
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sz").as("sz_a"), col("y.sz").as("sz_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .withColumn("n_union", col("sz_a") + col("sz_b") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
  }

  /** Cross-corpus n-gram overlap — the train/test CONTAMINATION check:
    * for every (probe, corpus) doc pair sharing >= minShared n-grams,
    * the shared count and the fraction of the probe's shingles it
    * covers. Same inverted-index shape as [[ngramJaccardPairs]] (one
    * shuffle on the shingle key, counted intersection, no pair-space
    * materialization, `maxDf` skew guard) but across TWO corpora, so
    * the candidate space is |probe postings| × |corpus postings per
    * shingle| — at 100 TB the probe side (test set) is tiny next to
    * the corpus (train set) and the join skews broadcast-ish.
    *
    * Output: (probe_id, corpus_id, n_shared, overlap_frac).
    */
  def crossOverlapPairs(probe: DataFrame, corpus: DataFrame,
                        textCol: String, idCol: String, n: Int,
                        minShared: Long,
                        maxDf: Long = Long.MaxValue): DataFrame = {
    // Persisted like ngramJaccardPairs' set table: shingling is the
    // expensive narrow stage and each side feeds the join exactly once
    // per invocation — the 100 TB analogue is materializing the shingle
    // tables before the join stage.
    def posts(df: DataFrame) = {
      val sized = shingleSets(df, textCol, idCol, n)
        .select(col("doc_id"), col("sh"),
          size(col("sh")).cast(LongType).as("sz"))
        .filter(col("sz") > 0)
        .persist()
      sized.select(col("doc_id"), col("sz"), explode(col("sh")).as("s"))
    }
    val corpusPosts =
      if (maxDf == Long.MaxValue) posts(corpus)
      else {
        val byShingle =
          org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
        posts(corpus).withColumn("df", count(lit(1)).over(byShingle))
          .filter(col("df") <= maxDf).drop("df")
      }
    posts(probe).as("p").mergeHint.join(
        corpusPosts.as("c").mergeHint,
        col("p.s") === col("c.s"))
      .groupBy(col("p.doc_id").as("probe_id"),
        col("c.doc_id").as("corpus_id"), col("p.sz").as("sz_p"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumn("overlap_frac",
        col("n_shared").cast(DoubleType) / col("sz_p").cast(DoubleType))
      .select("probe_id", "corpus_id", "n_shared", "overlap_frac")
  }

  /** Join candidate (doc_a, doc_b) pairs back to their shingle sets and
    * keep those with exact Jaccard >= minJaccard.
    */
  def verifyJaccard(cand: DataFrame, sets: DataFrame,
                    minJaccard: Double): DataFrame =
    cand
      .mergeHint
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        .mergeHint, "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        .mergeHint, "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType))
      .withColumn("n_union",
        size(array_union(col("sh_a"), col("sh_b"))).cast(LongType))
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")

  /** MinHash signature from PRE-HASHED shingles: sig[j] = min over base
    * hashes h of (h · a_j + b_j) wrapping mod 2^64 — a universal-hash
    * family over ONE xxhash64 per shingle instead of k string hashes
    * per shingle. `hs` must be an attribute column (see
    * [[minhashPairs]]): a lambda body re-evaluates non-attribute
    * children per invocation, so an inlined hash array would be
    * recomputed k times per row.
    */
  def minhashSignature(hs: Column, k: Int): Column =
    // Native codegen'd k×n min-hash loop (functions.MinHashSig) —
    // bit-identical to the declarative
    // `transform(sequence(0,k-1), j -> array_min(transform(hs, h ->
    // xxhash64(j, h))))` but one tight Java loop instead of an
    // interpreted nested HOF with a k×n intermediate per row.
    graft.functions.Native.minhashSig(hs, k)

  /** One xxhash64 per distinct shingle — the base hashes the k-band
    * signature derives from.
    */
  def baseHashes(sh: Column): Column = transform(sh, s => xxhash64(s))

  /** LSH banding: split the k-wide signature into `bands` bands of
    * k/bands rows; bucket key = hash of the band slice. Docs colliding in
    * any band become candidates. Probability a pair with Jaccard j
    * collides: 1 - (1 - j^r)^b.
    */
  def minhashCandidates(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r)))))
        .as(Seq("band", "bucket")))
    banded.as("x").mergeHint.join(banded.as("y").mergeHint,
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH banding with the signature-estimate PREFILTER fused into the
    * band join — stage one of two-stage verification. The banded rows
    * carry a BYTE-PACKED signature ([[graft.functions.SigPack]]: each
    * value's low byte, k/8 longs — 32 B at k=32 instead of 256 B), so
    * the estimated agreement count (byte-agreements, a one-sided proxy
    * for the Broder '97 estimator: value equality implies byte
    * equality, false byte matches at P = 1/256 per disagreeing
    * position) is computed inline on the join output and candidates
    * below `minAgree` agreements are dropped BEFORE the distinct
    * shuffle and the shingle-array attach joins. The packed payload
    * rides only the banded table's sort — n·bands rows — never the
    * candidate stream, and the join output is pipeline-fused
    * (SMJ → sig_agree_bytes → filter) so pruned candidates never touch
    * disk. Because the proxy errs only toward keeping candidates, the
    * recall of any threshold is ≥ the full-signature gate's; survivors
    * inflate by ≤ E[Binom(k − agree, 1/256)] ≈ 0.1 expected false
    * agreements per pair at k=32. k not divisible by 8 falls back to
    * the full-signature gate.
    */
  def minhashCandidatesEst(sigs: DataFrame, k: Int, bands: Int,
                           minAgree: Int): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    val packed = k % 8 == 0
    val carry =
      if (packed) graft.functions.Native.sigPack(col("sig")).as("sigp")
      else col("sig").as("sigp")
    def agree(a: Column, b: Column): Column =
      if (packed) graft.functions.Native.sigAgreeBytes(a, b)
      else graft.functions.Native.sigAgree(a, b)
    val banded = sigs.select(col("doc_id"), carry,
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r)))))
        .as(Seq("band", "bucket")))
    banded.as("x").mergeHint.join(banded.as("y").mergeHint,
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(agree(col("x.sigp"), col("y.sigp")) >= minAgree)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket
    * join → signature-estimate prefilter → exact-Jaccard verification
    * of the surviving candidates.
    *
    * TWO-STAGE VERIFICATION (the corpus-scale contract): the exact
    * verification attaches two per-doc shingle arrays (~doc-sized
    * payload) to every candidate; at gen-sf100 the registered banding
    * produced a measured-n² 279M-row candidate stream on the saturated
    * corpus and the attach joins ENOSPC'd at ~600 GB of sort spill.
    * Stage one therefore estimates Jaccard from the already-computed
    * k-hash signature — O(1) payload, codegen'd — and only candidates
    * with at least `ceil(k·(minJaccard − prefilterSigmas·σ))` agreeing
    * positions reach the exact stage, where σ =
    * sqrt(minJaccard·(1−minJaccard)/k) is the estimator's standard
    * deviation at the threshold. When 8 | k (the registered k=32) the
    * banded table carries the low-byte-packed signature
    * ([[graft.functions.SigPack]], k/8 longs) and the gate counts byte
    * agreements ([[graft.functions.SigAgreeBytes]]) — an 8× payload
    * cut whose proxy error is one-sided toward KEEPING candidates;
    * otherwise the full signature rides with
    * [[graft.functions.SigAgree]].
    *
    * Recall contract: a band-colliding pair gets ≥ r = k/bands
    * agreements free (the colliding band's slice is equal), so a TRUE
    * pair (exact Jaccard j ≥ τ) is pruned only when its OTHER k−r
    * positions agree fewer than ceil(k·(τ − s·σ)) − r times — a
    * Binomial(k−r, j) lower tail. At the registered parameters
    * (k=32, bands=8, τ=0.5, s=3 → minAgree=8) that is
    * P[Binom(28, 0.5) ≤ 3] ≈ 1.4e-5 per boundary pair (an upper bound
    * for the byte gate, whose false byte-matches only add agreements),
    * and it decays
    * geometrically above the boundary (j=0.55 → ~1e-7, j=0.6 → ~1e-9);
    * measured two-stage-vs-single-stage symmetric diff is zero at
    * testdata sf0.1, gen-sf3/sf10/sf30 and open-vocab
    * ov-sf3/ov-sf10/ov-sf30/ov-sf100 — re-measured in full after the
    * byte-packed gate landed, ~390k pairs per ladder (SURVEY §6.1
    * "Two-stage MinHash verification, measured" + "Byte-packed
    * prefilter", and sweeps/sweep_minhash_diff.jsonl).
    * `prefilterSigmas = Double.PositiveInfinity`
    * disables the prefilter (bit-exact single-stage semantics); the
    * plain path is also taken automatically when the computed minAgree
    * ≤ r, where the filter could never prune a collision.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   n: Int, k: Int, bands: Int, minJaccard: Double,
                   prefilterSigmas: Double = 3.0): DataFrame = {
    val sets = shingleSets(df, textCol, idCol, n).cache()
    // Cached so `hs` is a real attribute when the signature lambda reads
    // it: CollapseProject would otherwise inline the per-shingle string
    // hashing into the band lambda, re-hashing every shingle k times
    // (static ref-count 1, dynamic eval-count k).
    val hashed = sets.filter(size(col("sh")) > 0)
      .select(col("doc_id"), baseHashes(col("sh")).as("hs"))
      .cache()
    val sigs = hashed
      .select(col("doc_id"), minhashSignature(col("hs"), k).as("sig"))
    val sigma = math.sqrt(minJaccard * (1.0 - minJaccard) / k)
    val minAgree =
      if (prefilterSigmas.isPosInfinity) 0
      else math.ceil(k * (minJaccard - prefilterSigmas * sigma)).toInt
    val cand =
      if (minAgree > k / bands) minhashCandidatesEst(sigs, k, bands,
        minAgree)
      else minhashCandidates(sigs, k, bands)
    verifyJaccard(cand, sets, minJaccard)
  }

  /** 64-bit SimHash over the token bag: bit i of the hash of each token
    * votes +1/-1; the sign of the tally is bit i of the fingerprint.
    * Per-row array-fold form — fine for composition, but higher-order
    * functions run interpreted; [[simhashTable]] is the codegen'd path.
    */
  def simhash(toks: Column): Column = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val tallies = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, masks,
        (a, m) => a + when(xxhash64(t).bitwiseAND(m) =!= 0L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(tallies, masks, (v, m) => when(v > 0, m).otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** (doc_id, fp) via explode → 64 codegen'd vote columns → one
    * partially-aggregated groupBy — every operator whole-stage-codegen'd
    * and map-side combined, unlike the interpreted array-fold form.
    * Docs with no tokens are absent from the output (they have no
    * fingerprint to compare anyway).
    */
  def simhashTable(df: DataFrame, textCol: String,
                   idCol: String): DataFrame = {
    val toked = df.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("t"))
    val hashed = toked.select(col("doc_id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map(i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0L, 1L)
        .otherwise(-1L)).as(s"v$i"))
    val tallies = hashed.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val fp = (0 until 64).map(i =>
        when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    tallies.select(col("doc_id"), fp.as("fp"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming distance <= maxHamming, via the
    * standard 4x16-bit band trick: distance <= 3 implies at least one of
    * the 4 bands matches exactly, so candidates come from 4 equality
    * joins (union'd), then exact popcount verification.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-band scheme guarantees recall only to 3")
    val fps = simhashTable(df, textCol, idCol).cache()
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("band"),
        shiftright(col("fp"), b * 16).bitwiseAND(65535L).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("fp"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("x").mergeHint.join(banded.as("y").mergeHint,
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** 128-bit SimHash fingerprint — the WIDE form that keeps banded
    * near-dup search linear at corpus scale. The 64-bit scheme's
    * 4×16-bit bands collide at random with probability 2^-16 per band,
    * so its candidate-pair space grows ~4·n²/2^16 — measured
    * superlinear at gen-sf10 (500k docs: q_dedup_simhash walled 5.1×
    * for 3.3× rows). Two independent 64-bit vote tallies (seeded
    * xxhash64) give 128 bits → 4×32-bit bands: the same pigeonhole
    * guarantee for hamming ≤ 3, with the random-collision floor pushed
    * to 4·n²/2^32 — negligible into the billions of documents.
    * Output: (doc_id, fp_lo, fp_hi); same codegen'd
    * explode→votes→one-groupBy shape as [[simhashTable]].
    */
  def simhashWideTable(df: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    val toked = df.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("t"))
    val hashed = toked.select(col("doc_id"),
      xxhash64(col("t")).as("h1"), xxhash64(lit(1L), col("t")).as("h2"))
    def votes(h: String, tag: String) = (0 until 64).map(i =>
      sum(when(col(h).bitwiseAND(lit(1L << i)) =!= 0L, 1L)
        .otherwise(-1L)).as(s"$tag$i"))
    val all = votes("h1", "a") ++ votes("h2", "b")
    val tallies = hashed.groupBy("doc_id").agg(all.head, all.tail: _*)
    def fp(tag: String) = (0 until 64).map(i =>
        when(col(s"$tag$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    tallies.select(col("doc_id"), fp("a").as("fp_lo"), fp("b").as("fp_hi"))
  }

  /** 128-bit hamming distance over the (lo, hi) fingerprint pair. */
  def hammingWide(aLo: Column, aHi: Column,
                  bLo: Column, bHi: Column): Column =
    bit_count(aLo.bitwiseXOR(bLo)) + bit_count(aHi.bitwiseXOR(bHi))

  /** SimHash near-dup pairs over the 128-bit fingerprint: 4×32-bit
    * bands (2 from fp_lo, 2 from fp_hi), distance ≤ 3 ⇒ one band exact
    * — identical structure to [[simhashPairs]], collision floor 2^-32
    * per band instead of 2^-16. The corpus-scale form.
    */
  def simhashPairsWide(df: DataFrame, textCol: String, idCol: String,
                       maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-band scheme guarantees recall only to 3")
    val fps = simhashWideTable(df, textCol, idCol).cache()
    val mask32 = lit(0xffffffffL)
    val banded = fps.select(col("doc_id"), col("fp_lo"), col("fp_hi"),
      explode(array((0 until 4).map { b =>
        val src = if (b < 2) col("fp_lo") else col("fp_hi")
        struct(lit(b).as("band"),
          shiftright(src, (b % 2) * 32).bitwiseAND(mask32).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("fp_lo"), col("fp_hi"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("x").mergeHint.join(banded.as("y").mergeHint,
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp_lo").as("alo"), col("x.fp_hi").as("ahi"),
        col("y.fp_lo").as("blo"), col("y.fp_hi").as("bhi"))
      .distinct()
      .withColumn("hamming",
        hammingWide(col("alo"), col("ahi"), col("blo"), col("bhi")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** SimHash near-dup pairs with OUTPUT IDENTICAL to [[simhashPairs]]
    * but a collision floor of 2^-40 instead of 2^-16 — the
    * permuted-block scheme of Manku et al. (WWW'07, public paper) on
    * the same 64-bit fingerprint: split into 8 blocks of 8 bits; ≤ 3
    * errors corrupt ≤ 3 blocks, so ≥ 5 blocks survive intact and the
    * C(8,5) = 56-table index keyed on each 5-block combination (a
    * 40-bit key) finds every qualifying pair. Candidates are 56
    * explode rows per doc (vs 4) but random key collisions are
    * ~56·n²/2^41 — negligible into the trillions of documents, where
    * the 4×16-bit scheme's 4·n²/2^17 goes quadratic (measured: 2.39B
    * candidate pairs at 500k docs). Same exact-popcount verification;
    * same pair set out, bit for bit.
    */
  def simhashPairsBlocked(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "8-block/5-intact scheme guarantees <= 3")
    val fps = simhashTable(df, textCol, idCol).cache()
    val combos = (0 until 8).combinations(5).toSeq // 56, deterministic
    val tables = combos.zipWithIndex.map { case (blocks, t) =>
      val key = blocks.zipWithIndex.map { case (b, pos) =>
        shiftleft(shiftright(col("fp"), b * 8).bitwiseAND(lit(255L)),
          pos * 8)
      }.reduce((a, c) => a.bitwiseOR(c))
      struct(lit(t).as("tbl"), key.as("key"))
    }
    val banded = fps.select(col("doc_id"), col("fp"),
      explode(array(tables: _*)).as("bk"))
      .select(col("doc_id"), col("fp"),
        col("bk.tbl").as("tbl"), col("bk.key").as("key"))
    banded.as("x").mergeHint.join(banded.as("y").mergeHint,
        col("x.tbl") === col("y.tbl") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.fp").as("fp_a"), col("y.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", hamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
