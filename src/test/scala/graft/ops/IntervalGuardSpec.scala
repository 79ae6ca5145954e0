package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** The interval-join output-volume guard (VERDICT r17 item 6): the
  * exact overlap PAIR LIST is output-quadratic by semantics — an
  * all-concurrent corpus must fail loudly at estimate time, not die by
  * shuffle spill mid-join (the ungated form spilled >33 GB at gen-sf10
  * before being adjudicated feature-scale).
  */
class IntervalGuardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val a = Seq(
    (1L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:30:00")),
    (2L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:10:00")))
    .toDF("aid", "st_a", "en_a")
  private val b = Seq(
    (10L, ts("2024-01-01 02:00:00"), ts("2024-01-01 03:00:00")),
    (11L, ts("2024-01-01 02:30:00"), ts("2024-01-01 02:30:00")),
    (12L, ts("2024-01-01 03:00:01"), ts("2024-01-01 04:00:00")),
    (13L, ts("2024-01-01 04:30:00"), ts("2024-01-01 05:01:00")))
    .toDF("bid", "st_b", "en_b")

  test("pair estimate is the banded per-bucket count product") {
    // epoch-anchored (t0 divisible by 3600 — bucket boundaries are
    // absolute epoch hours, independent of the JVM timezone). Hour
    // bands: eA1 covers buckets {0,1,2}, eA2 {5}; eB10 {2,3}, eB11
    // {2}, eB12 {3,4}, eB13 {4,5}. Shared-bucket products:
    // bkt2 1*2=2, bkt5 1*1=1 -> 3.
    val t0 = 1699999200L // = 472222 * 3600
    def mk(rows: Seq[(Long, Long, Long)], p: String) =
      rows.toDF(s"${p}id", "s", "e").selectExpr(s"${p}id",
        s"timestamp_seconds(s) AS st_$p", s"timestamp_seconds(e) AS en_$p")
    val eA = mk(Seq((1L, t0 + 1800, t0 + 9000),
      (2L, t0 + 18000, t0 + 18600)), "a")
    val eB = mk(Seq((10L, t0 + 7200, t0 + 10800),
      (11L, t0 + 9000, t0 + 9000), (12L, t0 + 10801, t0 + 14400),
      (13L, t0 + 16200, t0 + 18060)), "b")
    val est = Relational.intervalJoinPairEstimate(
      eA, eB, "st_a", "en_a", "st_b", "en_b", bucketSeconds = 3600L)
    assert(est == 3L)
    // disjoint band sets -> zero, not null
    val none = Relational.intervalJoinPairEstimate(
      eA.limit(0), eB, "st_a", "en_a", "st_b", "en_b", 3600L)
    assert(none == 0L)
  }

  test("guarded form under the cap ≡ unguarded intervalJoin") {
    val guarded = Relational.intervalJoinGuarded(
        a, b, "st_a", "en_a", "st_b", "en_b", 3600L, maxPairs = 100L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    val plain = Relational.intervalJoin(
        a, b, "st_a", "en_a", "st_b", "en_b", 3600L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(guarded == plain && guarded == Set((1L, 10L), (1L, 11L),
      (2L, 13L)))
  }

  test("over-cap corpus fails loudly at estimate time, pointing at " +
      "the aggregate companion") {
    // planted all-concurrent corpus: 400 x 500 intervals in ONE hour
    // band -> estimate 200,000 candidate pairs, cap 100,000
    val t0 = 1700000000L
    val bigA = spark.range(400).selectExpr("id AS aid",
      s"timestamp_seconds($t0 + id) AS st_a",
      s"timestamp_seconds($t0 + 600 + id) AS en_a")
    val bigB = spark.range(500).selectExpr("id AS bid",
      s"timestamp_seconds($t0 + id) AS st_b",
      s"timestamp_seconds($t0 + 600 + id) AS en_b")
    val e = intercept[IllegalStateException] {
      Relational.intervalJoinGuarded(bigA, bigB, "st_a", "en_a",
        "st_b", "en_b", bucketSeconds = 3600L, maxPairs = 100000L,
        hint = "(q_join_interval_agg is the corpus-scale companion.)")
    }
    assert(e.getMessage.contains("exceeds maxPairs"))
    // the caller-supplied hint is appended verbatim …
    assert(e.getMessage.contains("q_join_interval_agg"))
    // … and the generic layer names no caller query on its own
    // (ADVICE r18: remediation text belongs to the caller)
    val bare = intercept[IllegalStateException] {
      Relational.intervalJoinGuarded(bigA, bigB, "st_a", "en_a",
        "st_b", "en_b", bucketSeconds = 3600L, maxPairs = 100000L)
    }
    assert(!bare.getMessage.contains("q_join_interval_agg"))
    assert(!bare.getMessage.contains("SPARK_GRAFT_INTERVAL_PAIR_CAP"))
  }
}
