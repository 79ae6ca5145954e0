package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SigBytesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference packer mirroring [[SigPack]]'s contract. */
  private def refPack(sig: Seq[Long]): Seq[Long] =
    sig.grouped(8).filter(_.size == 8).map(
      _.foldLeft(0L)((acc, v) => (acc << 8) | (v & 0xFFL))).toSeq

  /** Reference byte-agreement count over two packed sequences. */
  private def refAgree(a: Seq[Long], b: Seq[Long]): Int =
    a.zip(b).map { case (x, y) =>
      val xor = x ^ y
      (0 until 64 by 8).count(s => ((xor >>> s) & 0xFFL) == 0L)
    }.sum

  test("sig_pack matches the reference packer on multiple-of-8 lengths") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(200) { i =>
      val len = Seq(32, 8, 16, 24)(i % 4)
      (i.toLong, Seq.fill(len)(rnd.nextLong()))
    }
    val got = rows.toDF("id", "sig")
      .select($"id", Native.sigPack($"sig").as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    rows.foreach { case (id, sig) => assert(got(id) == refPack(sig)) }
  }

  test("sig_pack raises on a length that is not a multiple of 8 — " +
      "both codegen and interpreted paths (ADVICE r13: the old silent " +
      "truncation gave a direct SQL caller wrong agreement counts)") {
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    // codegen path (column input)
    val viaCodegen = intercept[Exception] {
      Seq((1L, Seq.fill(13)(7L))).toDF("id", "sig")
        .select(Native.sigPack($"sig")).collect()
    }
    assert(chain(viaCodegen).contains("multiple of 8"),
      s"unexpected: ${chain(viaCodegen)}")
    // interpreted path (literal fold at optimization time)
    val viaInterp = intercept[Exception] {
      spark.range(1)
        .select(Native.sigPack(array(Seq.fill(13)(lit(7L)): _*)))
        .collect()
    }
    assert(chain(viaInterp).contains("multiple of 8"),
      s"unexpected: ${chain(viaInterp)}")
  }

  test("sig_agree_bytes matches the reference count and is always >= " +
      "sig_agree on the unpacked signatures (the one-sided proxy " +
      "contract the prefilter's recall bound rests on)") {
    val rnd = new scala.util.Random(37)
    // Small value domain so positions genuinely collide; plus pairs
    // differing ONLY above the low byte, where the proxy must
    // (correctly) count a false agreement rather than prune.
    val rows = Seq.tabulate(300) { i =>
      val a = Seq.fill(32)(rnd.nextInt(6).toLong)
      val b =
        if (i % 5 == 0) a.map(v => v | (1L << 20)) // low bytes all equal
        else Seq.fill(32)(rnd.nextInt(6).toLong)
      (i.toLong, a, b)
    }
    val out = rows.toDF("id", "a", "b")
      .select($"id",
        Native.sigAgreeBytes(
          Native.sigPack($"a"), Native.sigPack($"b")).as("bytes"),
        Native.sigAgree($"a", $"b").as("full"))
      .as[(Long, Int, Int)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    out.foreach { case (id, bytes, full) =>
      val (_, a, b) = byId(id)
      assert(bytes == refAgree(refPack(a), refPack(b)))
      assert(bytes >= full,
        s"byte proxy pruned harder than the full gate at id=$id")
    }
    // the low-byte-equal rows must count all 32 as byte-agreements
    assert(out.filter(_._1 % 5 == 0).forall(_._2 == 32))
  }

  test("interpreted eval matches codegen (literal fold path)") {
    val sig = Seq.fill(8)(0x1234567890ABCDEFL)
    val sigB = sig.updated(3, 0x1234567890ABCD00L) // one low byte differs
    val viaCodegen = Seq((sig, sigB)).toDF("a", "b")
      .select(Native.sigAgreeBytes(
        Native.sigPack($"a"), Native.sigPack($"b"))).as[Int].head()
    val viaInterp = spark.range(1)
      .select(Native.sigAgreeBytes(
        Native.sigPack(array(sig.map(lit): _*)),
        Native.sigPack(array(sigB.map(lit): _*)))).as[Int].head()
    assert(viaCodegen == 7 && viaInterp == 7)
  }

  test("codegen path COMPILES — no silent interpreted fallback " +
      "(r17: Janino mis-parsed `x = (x << 8) | y` as a cast, so the " +
      "byte-proxy prefilter ran interpreted in the hot path while " +
      "every spec stayed green under the default FALLBACK mode)") {
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory =
      spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      // fallback=false: a WholeStageCodegen compile error THROWS;
      // factoryMode=CODEGEN_ONLY: expression-level codegen errors
      // throw too instead of demoting to interpreted eval.
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val rnd = new scala.util.Random(41)
      val rows = Seq.tabulate(64)(i =>
        (i.toLong, Seq.fill(32)(rnd.nextLong()), Seq.fill(32)(rnd.nextLong())))
      val out = rows.toDF("id", "a", "b")
        .select($"id",
          Native.sigAgreeBytes(
            Native.sigPack($"a"), Native.sigPack($"b")).as("bytes"))
        .as[(Long, Int)].collect().toMap
      rows.foreach { case (id, a, b) =>
        assert(out(id) == refAgree(refPack(a), refPack(b)))
      }
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("SQL registration resolves sig_pack and sig_agree_bytes") {
    Native.register(spark)
    val n = spark.sql(
      """SELECT sig_agree_bytes(
        |  sig_pack(array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
        |  sig_pack(array(1L, 2L, 0L, 4L, 5L, 6L, 7L, 8L)))""".stripMargin)
      .as[Int].head()
    assert(n == 7)
  }
}
