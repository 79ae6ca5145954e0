package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local[4] session for all suites (one JVM-wide session keeps
  * `sbt test` fast; suites must not mutate global conf).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    // Per-JVM temp warehouse: managed test tables must never land in
    // the repo's spark-warehouse/ where they outlive the JVM and wedge
    // the next run with LOCATION_ALREADY_EXISTS (or just pile up).
    val warehouse = Sessions.tempWarehouse()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
