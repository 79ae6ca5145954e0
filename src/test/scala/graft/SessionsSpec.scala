package graft

import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {
  test("tuned builder applies the scale configuration") {
    // piggyback on the shared session: tuned() only sets configs, so
    // applying it to the existing builder must round-trip the values
    val s = Sessions.tuned(
      org.apache.spark.sql.SparkSession.builder().master("local[2]"),
      shufflePartitions = 16).getOrCreate()
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.parquet.compression.codec") == "zstd")
    assert(s.conf.get("spark.sql.sources.partitionOverwriteMode")
      == "dynamic")
  }

  test("shuffleParts auto-sizes from input bytes: cpus floor, one" +
      " partition per 64 MB above the knee") {
    assume(sys.env.get("SPARK_GRAFT_SHUFFLE_PARTS").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-sizing")
    def fake(name: String, mb: Int): Unit = {
      val f = dir.resolve(name)
      val ch = java.nio.file.Files.newByteChannel(f,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      ch.position(mb.toLong * 1048576 - 1)
      ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0)))
      ch.close()
    }
    fake("lineitem.parquet", 1024) // 16 partitions' worth
    fake("orders.parquet", 512)    // 8 more
    fake("notes.txt", 64)          // ignored: not parquet
    assert(Sessions.inputBytes(dir.toString) == 1536L * 1048576)
    // below the knee the core count wins; above, bytes/64MB wins
    assert(Sessions.shuffleParts(32, dir.toString) == 32)
    assert(Sessions.shuffleParts(8, dir.toString) == 24)
    // missing dir sizes as zero and falls back to cpus
    assert(Sessions.shuffleParts(32, dir.toString + "/nope") == 32)
    // tables as Spark output DIRECTORIES of part files count too
    java.nio.file.Files.createDirectories(dir.resolve("sub"))
    fake("sub/part-0.parquet", 64)
    assert(Sessions.shuffleParts(8, dir.toString) == 25)
  }

  test("streamShuffleParts sizes state-store partitions at cores/2" +
      " with a floor of 4") {
    assert(Sessions.streamShuffleParts(32) == 16)
    assert(Sessions.streamShuffleParts(8) == 4)
    assert(Sessions.streamShuffleParts(2) == 4)
  }

  test("inputBytes counts a file reached via several sibling symlinks" +
      " once (real-path dedup), and symlinked parquet at all") {
    val real = java.nio.file.Files.createTempDirectory("graft-real")
    val linked = java.nio.file.Files.createTempDirectory("graft-links")
    val f = real.resolve("lineitem.parquet")
    val ch = java.nio.file.Files.newByteChannel(f,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    ch.position(10L * 1048576 - 1)
    ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0)))
    ch.close()
    // two sibling symlinks to the SAME parquet: loop detection can't
    // see this (no ancestor cycle) — dedup must (ADVICE r15)
    java.nio.file.Files.createSymbolicLink(
      linked.resolve("lineitem.parquet"), f)
    java.nio.file.Files.createSymbolicLink(
      linked.resolve("orders.parquet"), f)
    assert(Sessions.inputBytes(linked.toString) == 10L * 1048576)
  }
}
