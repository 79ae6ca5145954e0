package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch profiling entry — not part of the driver contract.
  *
  * Each run re-invokes the query FUNCTION (like Bench), so iterative
  * queries whose driver work happens inside the builder (ALS fit,
  * LinUCB collect) are measured whole. A SparkListener reports
  * jobs/stages/tasks per run — the driver-scheduling profile VERDICT
  * r15 item 2 asks for: an iterative query that is slow because of
  * many tiny jobs shows up here, not in any single plan.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"), Sessions.shuffleParts(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_AQE=0 disables AQE for this profile run only — the
    // A/B separating real scheduling cost from AQE's per-query-stage
    // materialization jobs (each exchange shows as its own
    // CompletableFuture job under AQE; with it off the same plan runs
    // as classic multi-stage jobs). Production sessions keep AQE on.
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v == "1"))
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val runT0 = new java.util.concurrent.atomic.AtomicLong()
    val jobT0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobT0.put(j.jobId, System.nanoTime())
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?"))
        jobLog.put(j.jobId, s"$site stages=${j.stageInfos.size}")
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler
          .SparkListenerJobEnd): Unit = {
        Option(jobT0.remove(e.jobId)).foreach { t0 =>
          val ms = (System.nanoTime() - t0) / 1e6
          val off = (t0 - runT0.get) / 1e6
          jobLog.computeIfPresent(e.jobId,
            (_, v) => f"$v start=$off%.0f ms=$ms%.0f")
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = s.stageInfo
        val wall = for {
          t0 <- i.submissionTime; t1 <- i.completionTime
        } yield t1 - t0
        val m = i.taskMetrics
        println(f"    stage ${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"wall=${wall.getOrElse(-1L)}%5d ms " +
          f"run=${m.executorRunTime}%6d ms " +
          f"cpu=${m.executorCpuTime / 1000000}%6d ms " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8d kB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8d kB  " +
          i.name.takeWhile(_ != '\n').take(60))
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    })
    val q = Queries.queries(args.headOption.getOrElse("q_dedup_ngram"))
    q(spark, dir).explain("formatted")
    for (i <- 1 to 3) {
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      runT0.set(t0)
      val n = q(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async (private[spark] bus, no waitUntilEmpty
      // from here) — poll until the counters are stable across two
      // consecutive reads rather than trusting one fixed sleep, which
      // under-counts on a loaded machine (ADVICE r16). Bounded retries
      // so a wedged bus can't hang the profile.
      var drained = false
      var tries = 0
      while (!drained && tries < 20) {
        val before = (jobs.get, stages.get, tasks.get)
        Thread.sleep(150)
        drained = before == ((jobs.get, stages.get, tasks.get))
        tries += 1
      }
      println(s"run$i rows=$n sec=$sec jobs=${jobs.get - j0} " +
        s"stages=${stages.get - s0} tasks=${tasks.get - k0}")
      if (i == 3) {
        import scala.jdk.CollectionConverters._
        jobLog.asScala.toSeq.sortBy(_._1).foreach { case (id, v) =>
          println(s"  job $id: $v")
        }
      }
      jobLog.clear()
    }
    spark.stop()
  }
}
