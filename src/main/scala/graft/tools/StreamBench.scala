package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions
import graft.streaming.Streams

/** Streaming micro-batch THROUGHPUT measurement — the one performance
  * axis the batch bench can't see. Queues `batches` MemoryStream
  * blocks, drains them with `Trigger.AvailableNow` (one micro-batch
  * per block), and reports drained rows/second for the representative
  * stateful paths:
  *
  *  - windowedAgg: tumbling event-time window + watermark (the A21
  *    consume path)
  *  - runningUserStats: mapGroupsWithState running moments (the A20/A22
  *    feedback-loop state shape)
  *  - rollingStatsTws: transformWithState trailing-window stats on the
  *    RocksDB store (the Spark-4 state API twin of q_rolling_stats)
  *
  * Rows/s here is single-JVM local[N] with per-batch planning overhead
  * included — at cluster scale the same plans shard by key across
  * executors, so treat the number as a floor for one node, not a
  * ceiling for the engine. Usage:
  * `runMain graft.tools.StreamBench [rows] [batches]`.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false"), Sessions.shuffleParts(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // transformWithState requires the RocksDB store; use it uniformly
    // so all three paths bench the production state backend
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val perBatch = (nRows / nBatches).toInt
    val users = 10000L
    val t0 = 1700000000L
    val total = nBatches.toLong * perBatch

    // queue ALL blocks first (AvailableNow snapshots the queued offsets
    // at start), then time start→termination: pure drain throughput
    def timeDrain(start: () => org.apache.spark.sql.streaming
        .StreamingQuery): Double = {
      val begin = System.nanoTime()
      val q = start()
      q.awaitTermination()
      total.toDouble / ((System.nanoTime() - begin) / 1e9)
    }

    val winIn = MemoryStream[(Timestamp, Long, Double)]
    (0L until nBatches).foreach { b =>
      winIn.addData((0 until perBatch).map { j =>
        val i = b * perBatch + j
        (new Timestamp((t0 + i / 600) * 1000L), i % users, 1.0)
      })
    }
    val winRps = timeDrain(() =>
      Streams.windowedAgg(winIn.toDF().toDF("ts", "user_id", "value"),
          "ts", "user_id", "value", "1 minute")
        .writeStream.format("memory").queryName("sb_win")
        .outputMode("update").trigger(Trigger.AvailableNow()).start())

    val mgsIn = MemoryStream[(Long, Double)]
    (0L until nBatches).foreach { b =>
      mgsIn.addData((0 until perBatch).map { j =>
        val i = b * perBatch + j
        (i % users, (i % 97).toDouble)
      })
    }
    val mgsRps = timeDrain(() =>
      Streams.runningUserStats(mgsIn.toDS())
        .writeStream.format("memory").queryName("sb_mgs")
        .outputMode("update").trigger(Trigger.AvailableNow()).start())

    val twsIn = MemoryStream[(Long, Long, Long, Long)]
    (0L until nBatches).foreach { b =>
      twsIn.addData((0 until perBatch).map { j =>
        val i = b * perBatch + j
        // (user, id, ts_s, x) — ts monotone non-decreasing so the
        // trailing-window replay matches the processor's contract
        (i % users, i, t0 + i / 600, i % 97)
      })
    }
    val twsRps = timeDrain(() =>
      Streams.rollingStatsTws(twsIn.toDS(), windowSec = 3600L)
        .writeStream.format("memory").queryName("sb_tws")
        .outputMode("append").trigger(Trigger.AvailableNow()).start())

    println(s"""{"rows":$total,"batches":$nBatches,""" +
      s""""windowed_agg_krows_s":${(winRps / 1000).round},""" +
      s""""map_groups_state_krows_s":${(mgsRps / 1000).round},""" +
      s""""tws_rolling_krows_s":${(twsRps / 1000).round}}""")
    spark.stop()
  }
}
