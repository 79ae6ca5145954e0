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
}
