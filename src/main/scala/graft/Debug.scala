package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling entry — not part of the driver contract. */
object Debug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"), Sessions.shuffleParts(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val q = Queries.queries(args.headOption.getOrElse("q_dedup_ngram"))
    val df = q(spark, dir)
    df.explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
