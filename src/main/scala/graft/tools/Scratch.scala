package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling scratchpad for the optimization round — edited
  * in place per experiment, never part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.tuned(SparkSession.builder()
        .master("local[32]").config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f  $r")
    }
    val keys = Map("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey")
    def views(rep: Boolean): Unit =
      Seq("customer", "orders", "lineitem").foreach { n =>
        val df = graft.io.Tables.table(spark, dir, n)
        (if (rep) df.repartition(
          spark.sparkContext.defaultParallelism, col(keys(n)))
        else df).createOrReplaceTempView(n)
      }
    def q3() = spark.sql(graft.RelationalQueries.SqlTextQuery3).count()
    views(rep = false); q3() // warm plain
    views(rep = true); q3()  // warm rep
    for (i <- 1 to 4) {
      views(rep = false); t(s"q3 plain #$i")(q3())
      views(rep = true); t(s"q3 rep   #$i")(q3())
    }
    spark.stop()
  }
}
