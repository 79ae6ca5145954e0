package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec,
  ShuffledHashJoinExec, SortMergeJoinExec}

import graft.SparkSpec

/** Skew-guard demonstrations (VERDICT r04 #5): the maxDf posting guard
  * and the AQE skew-join path were argued in comments but never
  * exercised under a PLANTED hot key. These specs measure the real
  * executed plans — they fail if either guard is removed.
  */
class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Every physical node, descending through AQE wrappers,
    * materialized query stages, AND cached relations —
    * TreeNode.collect alone treats QueryStageExec and
    * InMemoryTableScanExec as leaves, hiding join nodes (and their
    * metrics) inside earlier stages or behind a persist().
    */
  private def deepNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.toSeq.flatMap {
      case a: AdaptiveSparkPlanExec => a +: deepNodes(a.executedPlan)
      case q: QueryStageExec => q +: deepNodes(q.plan)
      case c: InMemoryTableScanExec =>
        c +: deepNodes(c.relation.cachedPlan)
      case n => Seq(n)
    }

  private def maxJoinOutputRows(df: DataFrame): Long = {
    df.collect()
    val joins = deepNodes(df.queryExecution.executedPlan).collect {
      case j: BaseJoinExec => j.metrics("numOutputRows").value
    }
    assert(joins.nonEmpty, "no join node found in the executed plan")
    joins.max
  }

  test("ngramJaccardPairs maxDf guard caps the posting self-join under " +
    "a viral shingle — and still finds the true duplicate pair") {
    // 200 docs share the same 4-token boilerplate opener → the two
    // opening trigrams have df=200; one genuine duplicate pair
    // (300, 301) whose shingles are rare (df=2). All docs have equal
    // shingle counts so the Jaccard size-prune inside the join cannot
    // mask the skew.
    val docs = ((0 until 200).map { i =>
      (i.toLong, s"terms of service apply u$i a$i b$i c$i d$i e$i")
    } ++ Seq(
      (300L, "the quick brown fox jumps over the lazy dog again"),
      (301L, "the quick brown fox jumps over the lazy dog again")))
      .toDF("doc_id", "text")

    val guarded = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.5, maxDf = 10)
    val pairs = guarded.select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((300L, 301L)),
      s"guarded result wrong: $pairs")
    val guardedRows = maxJoinOutputRows(guarded)

    val unguarded = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.5)
    val unguardedRows = maxJoinOutputRows(unguarded)

    // two viral trigrams contribute 2 × C(200,2) = 39,800 join rows
    // without the guard; with it only the rare shingles collide. If
    // someone removes the df filter from ngramJaccardPairs, guardedRows
    // jumps to ~39,808 and this assertion fails.
    assert(unguardedRows >= 30000L,
      s"viral fixture no longer skews: $unguardedRows join rows")
    assert(guardedRows <= 100L,
      s"maxDf guard failed to cap the join: $guardedRows rows")
  }

  test("coOccurrenceEdges maxDeg guard caps the context self-join under " +
    "a planted hot context — and still finds the true strong tie") {
    // One viral context (c=0) touches 300 items → C(300,2) = 44,850
    // join rows from that key alone; ten normal contexts each hold
    // {1000, 1001, noise} so the genuine tie (1000, 1001) has shared=10
    // while every noise pair has shared=1 (mean ≈ 1.43, factor 2 →
    // threshold ≈ 2.9 keeps only the true tie).
    val hot = (0 until 300).map(i => (0L, i.toLong))
    val ties = (1 to 10).flatMap(c =>
      Seq((c.toLong, 1000L), (c.toLong, 1001L), (c.toLong, 2000L + c)))
    val pairs = (hot ++ ties).toDF("c", "i")

    val guarded = graft.ops.Graph.coOccurrenceEdges(
      pairs, "c", "i", meanFactor = 2.0, maxDeg = 50L)
    val edges = guarded.select("lo", "hi").as[(Long, Long)].collect().toSet
    assert(edges == Set((1000L, 1001L)), s"guarded result wrong: $edges")
    val guardedRows = maxJoinOutputRows(guarded)

    val unguarded = graft.ops.Graph.coOccurrenceEdges(
      pairs, "c", "i", meanFactor = 2.0)
    val unguardedRows = maxJoinOutputRows(unguarded)

    // if someone removes the degree filter from coOccurrenceEdges the
    // guarded join jumps to ~44,880 rows and this fails
    assert(unguardedRows >= 40000L,
      s"hot fixture no longer skews: $unguardedRows join rows")
    assert(guardedRows <= 100L,
      s"maxDeg guard failed to cap the join: $guardedRows rows")
  }

  test("bucketedPairs: AQE splits a planted hot LSH bucket " +
    "(skew-join kicks in instead of one straggler partition)") {
    // Separate session: thresholds lowered so local-scale data
    // exhibits the 100 TB failure shape (a bucket holding most of the
    // corpus), broadcast disabled so the self-join is a shuffle join —
    // the plan AQE's OptimizeSkewedJoin applies to.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    val sq = s2.sqlContext
    import sq.implicits._

    val rnd = new scala.util.Random(11)
    // 800 vectors with positive leading dims → all land in bucket 0b1111;
    // 30 scattered elsewhere so the hot partition towers over the median
    val hot = (0 until 800).map { i =>
      (i.toLong, (Array.fill(4)(1.0) ++
        Array.fill(4)(rnd.nextGaussian())).map(_.toFloat).toSeq)
    }
    val rest = (1000 until 1030).map { i =>
      (i.toLong, (Array.fill(4)(-1.0) ++
        Array.fill(4)(rnd.nextGaussian())).map(_.toFloat).toSeq)
    }
    val df = (hot ++ rest).toDF("vec_id", "embedding")

    val pairs = Similarity.bucketedPairs(df, "vec_id", "embedding",
      minCosine = 0.999, bits = 4, dim = 8)
    pairs.collect()
    val skewSplit = deepNodes(pairs.queryExecution.executedPlan).exists {
      case smj: SortMergeJoinExec => smj.isSkewJoin
      case shj: ShuffledHashJoinExec => shj.isSkewJoin
      case _ => false
    }
    assert(skewSplit,
      "AQE did not mark the bucket self-join as a skew join — the hot " +
        "bucket would run as one straggler partition")
  }
}
