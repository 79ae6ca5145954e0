package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scaling-slope evidence (SURVEY §5) is only as good as the
  * generator it runs on: these tests pin GenData to the driver
  * testdata's schema and structure so an sf1 slope number measured on
  * generated data speaks for the real tables.
  */
class GenDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("gendata").toString
    GenData.write(spark, d, 0.001)
    d
  }

  private val RefDir = "/root/testdata/sf0.001"

  test("generated tables match the driver testdata schemas exactly " +
      "(through Tables.table — the interface every query consumes; the " +
      "raw driver events.ts is TIMESTAMP(NANOS) which only exists " +
      "driver-side and is rebuilt to micros on read)") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val gen = graft.io.Tables.table(spark, dir, t).schema
      val ref = graft.io.Tables.table(spark, RefDir, t).schema
      val genCols = gen.fields.map(f => (f.name, f.dataType)).toSeq
        .sortBy(_._1)
      val refCols = ref.fields.map(f => (f.name, f.dataType)).toSeq
        .sortBy(_._1)
      assert(genCols == refCols, s"schema mismatch for $t")
    }
  }

  test("key ranges scale with sf and foreign keys resolve") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    assert(cust.count() == 150)
    // every o_custkey must exist in customer — referential integrity
    val dangling = ord.join(cust,
      ord("o_custkey") === cust("c_custkey"), "left_anti")
    assert(dangling.count() == 0)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val orphan = li.join(ord,
      li("l_orderkey") === ord("o_orderkey"), "left_anti")
    assert(orphan.count() == 0)
  }

  test("documents replant the near-dup structure the dedup family " +
      "hunts for (trailing-dup marker + exact copies)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count().toDouble
    val nearDups = docs.filter($"text".endsWith(" dup")).count()
    // generator plants ~5% near-dups (hash-selected, so binomial noise)
    assert(nearDups / n > 0.02 && nearDups / n < 0.09,
      s"near-dup fraction ${nearDups / n}")
    val exact = docs.groupBy("text").count().filter($"count" > 1).count()
    assert(exact > 0, "no exact duplicate groups planted")
    // and the reference testdata has the same marker structure
    val ref = spark.read.parquet(s"$RefDir/documents.parquet")
    assert(ref.filter($"text".endsWith(" dup")).count() > 0)
  }

  test("dictionary-column domains equal the driver testdata's") {
    // through Tables.table — the raw driver events.ts is TIMESTAMP(NANOS)
    // which plain spark.read.parquet rejects
    def domain(dir: String, table: String, expr: String): Set[String] =
      graft.io.Tables.table(spark, dir, table)
        .selectExpr(s"$expr AS v").distinct()
        .collect().map(_.getString(0)).toSet
    val checks = Seq(
      ("part", "split(p_name, ' ')[0]"),
      ("part", "split(p_name, ' ')[1]"),
      ("part", "p_type"),
      ("customer", "c_mktsegment"),
      ("orders", "o_orderstatus"),
      ("orders", "o_orderpriority"),
      ("events", "event_type"),
      ("documents", "lang"))
    for ((table, expr) <- checks)
      assert(domain(dir, table, expr) == domain(RefDir, table, expr),
        s"domain mismatch: $table / $expr")
    // document vocabulary: identical 30 words (modulo the "dup" marker)
    val vocab = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .distinct().collect().map(_.getString(0)).toSet - "dup"
    val refVocab = spark.read.parquet(s"$RefDir/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .distinct().collect().map(_.getString(0)).toSet - "dup"
    assert(vocab == refVocab)
  }

  test("embeddings are unit-normalized dim-64 float vectors") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val bad = emb.select(
        abs(aggregate($"embedding", lit(0.0d),
          (acc, x) => acc + x * x) - 1.0d).as("err"),
        size($"embedding").as("dim"))
      .filter($"err" > 1e-3 || $"dim" =!= 64)
    assert(bad.count() == 0)
  }

  test("--open-vocab documents: same schema and planted dup structure " +
      "as the closed-vocab table, Heaps-law vocabulary growth, and a " +
      "realistically LOW unrelated-pair Jaccard (the property the " +
      "closed 30-word corpus lacks)") {
    val dA = Files.createTempDirectory("genov_a").toString
    val dB = Files.createTempDirectory("genov_b").toString
    GenData.writeOpenVocab(spark, dA, 0.001) // nDoc = 500
    GenData.writeOpenVocab(spark, dB, 0.02)  // nDoc = 1000
    // ONLY documents.parquet is written (the dedup slopes read nothing
    // else; fact tables would make the variant dir expensive for free)
    val filesA = new java.io.File(dA).listFiles().map(_.getName).toSet
    assert(filesA == Set("documents.parquet"), s"unexpected files $filesA")
    val ov = spark.read.parquet(s"$dA/documents.parquet")
    val closed = spark.read.parquet(s"$dir/documents.parquet")
    assert(ov.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      closed.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // planted structure: ~5% trailing-dup markers, exact copies exist
    val n = ov.count().toDouble
    val near = ov.filter($"text".endsWith(" dup")).count()
    assert(near / n > 0.02 && near / n < 0.09, s"near-dup frac ${near / n}")
    assert(ov.groupBy("text").count().filter($"count" > 1).count() > 0)
    // Heaps growth: distinct tokens grow with corpus size (√-law via
    // openVocabSize) — and far beyond the closed 30-word dictionary
    def vocab(d: String): Long = spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w").agg(
        countDistinct($"w")).head().getLong(0)
    val vA = vocab(dA)
    val vB = vocab(dB)
    assert(vA > 300, s"open vocab too small: $vA")
    assert(vB > vA * 1.2, s"vocabulary did not grow: $vA -> $vB")
    // unrelated docs should share almost nothing: estimate baseline
    // 2-gram Jaccard over adjacent NON-dup doc pairs — on the closed
    // corpus this saturates near 0.5+; open-vocab must sit near 0
    import graft.text.Dedup
    val sets = Dedup.shingleSets(
      ov.filter(!$"text".endsWith(" dup")), "text", "doc_id", 2)
    val j = sets.as("a").join(sets.as("b"),
        $"a.doc_id" + 1 === $"b.doc_id")
      .select((size(array_intersect($"a.sh", $"b.sh")).cast("double") /
        size(array_union($"a.sh", $"b.sh"))).as("j"))
      .agg(avg($"j")).head().getDouble(0)
    assert(j < 0.05, s"baseline Jaccard not low: $j")
  }

  test("--open-vocab generation is deterministic and " +
      "partitioning-independent") {
    val d1 = Files.createTempDirectory("genov_d1").toString
    val d2 = Files.createTempDirectory("genov_d2").toString
    GenData.writeOpenVocab(spark, d1, 0.001)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      GenData.writeOpenVocab(spark, d2, 0.001)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    val a = spark.read.parquet(s"$d1/documents.parquet")
    val b = spark.read.parquet(s"$d2/documents.parquet")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("generation is deterministic and partitioning-independent " +
      "(xxhash64(id)-derived, not rand(seed))") {
    val d2 = Files.createTempDirectory("gendata2").toString
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      GenData.write(spark, d2, 0.001)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    for (t <- Seq("lineitem", "documents", "embeddings")) {
      val a = spark.read.parquet(s"$dir/$t.parquet")
      val b = spark.read.parquet(s"$d2/$t.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t differs across generation runs")
    }
  }

  // ---- --power-law trade graph (VERDICT r13 item 1: the graph-family
  // analog of --open-vocab — sparse projection, skewed degrees) -------

  /** sf 0.2 power-law dir shared by the structural tests below:
    * nCust = 30000, nSupp = 2000, nOrd = 300000.
    */
  private lazy val plDir: String = {
    val d = Files.createTempDirectory("genpl").toString
    GenData.writePowerLaw(spark, d, 0.2)
    d
  }

  /** Distinct co-occurring supplier pairs of the trade graph's
    * customer-context projection (the size driver of q_graph_degree /
    * q_graph_triangles' first shuffle).
    */
  private def projectionPairs(d: String): Long = {
    val cs = spark.read.parquet(s"$d/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
      .join(spark.read.parquet(s"$d/lineitem.parquet")
          .select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("i")).distinct()
    cs.as("a").join(cs.as("b"),
        $"a.c" === $"b.c" && $"a.i" < $"b.i")
      .select($"a.i", $"b.i").distinct().count()
  }

  test("--power-law: only orders+lineitem are written, with the driver " +
      "schemas, and generation is deterministic and " +
      "partitioning-independent") {
    val dA = Files.createTempDirectory("genpl_a").toString
    val dB = Files.createTempDirectory("genpl_b").toString
    GenData.writePowerLaw(spark, dA, 0.02)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      GenData.writePowerLaw(spark, dB, 0.02)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    val filesA = new java.io.File(dA).listFiles().map(_.getName).toSet
    assert(filesA == Set("orders.parquet", "lineitem.parquet"),
      s"unexpected files $filesA")
    for (t <- Seq("orders", "lineitem")) {
      val gen = graft.io.Tables.table(spark, dA, t).schema
      val ref = graft.io.Tables.table(spark, RefDir, t).schema
      assert(gen.fields.map(f => (f.name, f.dataType)).toSeq
        .sortBy(_._1) ==
        ref.fields.map(f => (f.name, f.dataType)).toSeq.sortBy(_._1),
        s"schema mismatch for $t")
      val a = spark.read.parquet(s"$dA/$t.parquet")
      val b = spark.read.parquet(s"$dB/$t.parquet")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t differs across generation runs")
    }
    // lineitem FK side still resolves against the generated orders
    val orphan = spark.read.parquet(s"$dA/lineitem.parquet")
      .join(spark.read.parquet(s"$dA/orders.parquet"),
        $"l_orderkey" === $"o_orderkey", "left_anti")
    assert(orphan.count() == 0)
  }

  test("--power-law degree law: customer-activity CCDF has slope ≈ −1 " +
      "(Zipf(1)), hub suppliers hold an outsized share, and no " +
      "customer's distinct-supplier degree exceeds window + hubs") {
    val ord = spark.read.parquet(s"$plDir/orders.parquet")
    val perCust = ord.groupBy("o_custkey").count()
      .select($"count").as[Long].collect()
    // CCDF at k = 8..128: Zipf(1) activity ⇒ N(orders ≥ k) ∝ 1/k,
    // i.e. log-log slope −1; a uniform draw would put ~0 customers
    // above 2× the mean (10) and the regression would be meaningless
    val ks = Seq(8L, 16L, 32L, 64L, 128L)
    val pts = ks.map { k =>
      val n = perCust.count(_ >= k)
      assert(n > 20, s"CCDF($k) = $n too small to regress on")
      (math.log(k.toDouble), math.log(n.toDouble))
    }
    val mx = pts.map(_._1).sum / pts.size
    val my = pts.map(_._2).sum / pts.size
    val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    assert(slope > -1.4 && slope < -0.65, s"CCDF slope $slope not ~ -1")
    // hub share: the planted hubs (ids < plHubs) must hold far more
    // than their uniform share (256/2000 = 12.8%)
    val li = spark.read.parquet(s"$plDir/lineitem.parquet")
    val hubs = GenData.plHubs(2000)
    val hubShare = li.filter($"l_suppkey" < hubs).count().toDouble /
      li.count()
    assert(hubShare > 0.2 && hubShare < 0.7, s"hub share $hubShare")
    // per-customer distinct-supplier degree is structurally bounded:
    // a customer can only ever see its window + the hub set
    val maxDeg = li.join(ord.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").distinct()
      .groupBy("o_custkey").count()
      .agg(max($"count")).head().getLong(0)
    assert(maxDeg <= GenData.plWindow(2000) + hubs,
      s"max distinct suppliers per customer $maxDeg exceeds the " +
        s"window+hubs bound")
  }

  test("--power-law projection density: distinct co-occurring supplier " +
      "pairs stay under the per-supplier structural bound and grow " +
      "~linearly in nSupp (the uniform corpus's grow ~nSupp² — the " +
      "dense-projection confound this corpus retires)") {
    val d2 = Files.createTempDirectory("genpl_dens").toString
    GenData.writePowerLaw(spark, d2, 0.8) // nSupp = 8000 (4× plDir's)
    val p1 = projectionPairs(plDir)
    val p2 = projectionPairs(d2)
    // per-supplier bound: window-mates (≤ 2·(window−1)) + hubs
    def bound(nSupp: Long): Long =
      nSupp * (2 * GenData.plWindow(nSupp) + GenData.plHubs(nSupp))
    assert(p1 <= bound(2000), s"sf0.2 pairs $p1 > ${bound(2000)}")
    assert(p2 <= bound(8000), s"sf0.8 pairs $p2 > ${bound(8000)}")
    // 4× the suppliers (and 4× the orders) must NOT quadruple-square
    // the pair space: linear ⇒ ratio ≈ 4, quadratic ⇒ ≈ 16
    val ratio = p2.toDouble / p1
    assert(ratio < 8.0, s"pair growth $p1 -> $p2 (ratio $ratio) is " +
      "not ~linear in nSupp")
  }
}
