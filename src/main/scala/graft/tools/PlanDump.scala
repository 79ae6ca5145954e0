package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{Queries, Sessions}

/** Dump `.explain("formatted")` for declared queries to files — the
  * plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <suffix> [q1,q2,...]`
  * (no list = every declared query). Reads SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS like Bench so plans reflect the bench session's
  * config (AQE, broadcast threshold, shuffle partitions).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = if (args.length > 2) args(2).split(",").map(_.trim).toSeq
                else Queries.all.map(_.name)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", Sessions.tempWarehouse())
        .config("spark.ui.enabled", "false"),
        Sessions.shuffleParts(cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = Queries.queries(name)
      val plan = try {
        fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"PLAN FAILED: $e" }
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
