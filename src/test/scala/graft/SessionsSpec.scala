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
}
