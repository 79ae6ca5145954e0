package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private def hofSig(hs: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(hs, h => xxhash64(j, h))))

  test("native signature is bit-identical to the declarative HOF form") {
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong()))
    }.toDF("id", "hs")
    val both = df.select($"id",
      Native.minhashSig($"hs", 32).as("native"),
      hofSig($"hs", 32).as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() == 0)
  }

  test("empty input yields null; callers filter empties first") {
    val df = Seq((1L, Seq.empty[Long]), (2L, Seq(5L))).toDF("id", "hs")
    val out = df.select($"id", Native.minhashSig($"hs", 4).as("s"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(out(1L).isEmpty && out(2L).exists(_.length == 4))
  }

  test("interpreted eval matches codegen (off-codegen paths agree)") {
    val df = Seq((1L, Seq(7L, -3L, 42L))).toDF("id", "hs")
    val viaCodegen = df
      .select(Native.minhashSig($"hs", 8).as("s")).as[Seq[Long]].head()
    // Literal-input fold runs the interpreted eval path at optimize time
    val viaInterp = spark.range(1)
      .select(Native.minhashSig(
        array(lit(7L), lit(-3L), lit(42L)), 8).as("s"))
      .as[Seq[Long]].head()
    assert(viaCodegen == viaInterp)
  }
  test("registers as SQL function minhash_sig via Native.register " +
    "(k must be an INT literal)") {
    Native.register(spark)
    Seq((1L, Seq(7L, -3L, 42L))).toDF("id", "hs")
      .createOrReplaceTempView("graft_mh_t")
    val viaSql = spark.sql(
      "SELECT minhash_sig(hs, 4) AS s FROM graft_mh_t")
      .as[Seq[Long]].head()
    val viaCol = Seq((1L, Seq(7L, -3L, 42L))).toDF("id", "hs")
      .select(Native.minhashSig($"hs", 4).as("s"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.length == 4)
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(hs, id) FROM graft_mh_t").collect()
    }
    assert(err.getMessage.contains("INT literal") ||
      Option(err.getCause).exists(_.getMessage.contains("INT literal")))
  }
}
