package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.feature.{EntityTypeDef, FeatureDef, FeatureStore}
import graft.ml.LinUcb
import graft.serving.PredictionServer

/** The reference's full feedback loop, wired end-to-end as ONE case
  * (notebook.ipynb:1025 — 5-min simulator cron; :1199 — 30-min retrain
  * cron; prediction_container/main.py:38-58 publish;
  * logger/main.py:107-186 replay + append):
  *
  *   HTTP /predict → NDJSON bus publish → streaming logger replay
  *   (deterministic environment) → exactly-once training append
  *   (idempotentAppendLoop) → feature-store streamingImport →
  *   bucketed streamingPointInTime serving (no future reads) →
  *   retrain → model-table upsert (upsertLoop, latest-per-action).
  *
  * The individual stages each have their own specs (StreamsSpec,
  * FeatureStoreSpec, PredictionServerSpec); this one proves the same
  * rows FLOW — end-state counts at every hop equal the number of
  * served prediction steps, and the retrained model's sufficient
  * stats account for every one of them.
  */
class FeedbackLoopE2ESpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private val numActions = 3
  private val base = Timestamp.valueOf("2024-01-01 00:00:00")

  /** Deterministic initial policy (the model the endpoint serves). */
  private def seedModel(): LinUcb.Model = {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      val x = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      (i % numActions, x.toSeq, x(i % dim))
    }
    LinUcb.fit(rows.toDF("action", "obs", "reward"), "action", "obs",
      "reward", dim, alpha = 0.3, lambda = 1.0)
  }

  /** Bus-line schema published by PredictionServer (main.py:44-58). */
  private val busSchema = StructType(Seq(
    StructField("observations", ArrayType(StructType(Seq(
      StructField("observation", ArrayType(ArrayType(DoubleType))))))),
    StructField("predicted_actions", ArrayType(StructType(Seq(
      StructField("predicted_action", ArrayType(IntegerType))))))))

  /** Logger replay: bus stream → (action, obs, reward, ts) training
    * rows. The environment is deterministic — reward is the chosen
    * action's coordinate of the observation — so every replay (incl.
    * after crash) derives identical rows, and the event time is a
    * deterministic function of obs(0), which the test's requests
    * encode as request*10 + step minutes.
    */
  private def loggerReplay(bus: org.apache.spark.sql.DataFrame) =
    bus
      .select(explode(arrays_zip(col("observations"),
        col("predicted_actions"))).as("i"))
      .select(col("i.observations.observation").as("obs_mat"),
        col("i.predicted_actions.predicted_action").as("acts"))
      .select(explode(arrays_zip(col("obs_mat"), col("acts"))).as("s"))
      .select(col("s.obs_mat").as("obs"),
        col("s.acts").cast("int").as("action"))
      .withColumn("reward", element_at(col("obs"), col("action") + 1))
      .withColumn("ts", expr("timestampadd(MINUTE, " +
        "CAST(element_at(obs, 1) AS INT), " +
        "TIMESTAMP'2024-01-01 00:00:00')"))

  test("full loop: predict → publish → replay → exactly-once append → " +
    "feature import → PIT serving → retrain upsert, counts conserved") {
    val root = Files.createTempDirectory("e2eloop").toString

    // ---- 1. serve: endpoint publishes each request to the NDJSON bus
    val model0 = seedModel()
    val busDir = s"$root/bus"
    val server = new PredictionServer(model0,
      PredictionServer.ndjsonPublisher(s"$busDir/feedback.ndjson"))
    server.start()
    val client = HttpClient.newHttpClient()
    // 3 requests x 2 observation steps; obs(0) = request*10 + step
    // makes every downstream row traceable and its event time derivable
    val served = (for (r <- 0 until 3) yield {
      val obs = Seq.tabulate(2)(s_ => Seq(r * 10.0 + s_, 0.5, -0.5, 0.25))
      val body = s"""{"instances":[{"observation":[${
        obs.map(_.mkString("[", ",", "]")).mkString(",")}]}]}"""
      val resp = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:${server.port}/predict"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      obs.map(o => (o, model0.act(o.toArray)))
    }).flatten
    server.stop()
    assert(served.size == 6)

    // ---- 2. logger replay → exactly-once training append (5-min loop)
    val trainPath = s"$root/train"
    def busStream() = spark.readStream.schema(busSchema).json(busDir)
    val q1 = Streams.idempotentAppendLoop(loggerReplay(busStream()),
      trainPath, s"$root/ckpt_train", Trigger.AvailableNow())
    try assert(q1.awaitTermination(120000)) finally q1.stop()
    val train = spark.read.parquet(trainPath)
    assert(train.count() == 6)
    // the next scheduled trigger with no new bus data must be a no-op
    // (checkpoint replay safety — the exactly-once half of the contract)
    val q2 = Streams.idempotentAppendLoop(loggerReplay(busStream()),
      trainPath, s"$root/ckpt_train", Trigger.AvailableNow())
    try assert(q2.awaitTermination(120000)) finally q2.stop()
    assert(spark.read.parquet(trainPath).count() == 6)
    // replayed rows match the environment applied to what was served
    val gotRows = train
      .select(col("action"), col("obs"), col("reward"))
      .as[(Int, Seq[Double], Double)].collect().toSet
    val wantRows = served
      .map { case (o, a) => (a, o, o(a)) }.toSet
    assert(gotRows == wantRows)

    // ---- 3. feature-store continuous import of the replayed rewards
    val fs = new FeatureStore(spark, s"$root/fstore")
    fs.createEntityType(EntityTypeDef("actions", "action_id",
      Seq(FeatureDef("reward", "DOUBLE", "replayed env reward"))))
    val q3 = fs.streamingImport("actions",
      loggerReplay(busStream())
        .select(col("action").cast("long").as("action_id"),
          col("reward"), col("ts").as("event_ts")),
      "event_ts", s"$root/ckpt_feat", Trigger.AvailableNow())
    try assert(q3.awaitTermination(120000)) finally q3.stop()
    assert(fs.readValues("actions").count() == 6)

    // ---- 4. PIT serving over the bucketed table: queries stream in
    // AFTER all values (incl. later ones) are already imported; each
    // must see only values stamped <= its as-of time
    // Managed table: MUST drop in a finally (FeatureStoreSpec
    // convention) or the warehouse dir outlives the catalog entry and
    // the next JVM's run dies with LOCATION_ALREADY_EXISTS.
    fs.compactBucketed("actions", "action_id", "e2e_loop_pit", 4)
    try {
    val entities = train.select(col("action").cast("long"))
      .distinct().as[Long].collect().toSeq.sorted
    val asOfs = Seq(
      Timestamp.valueOf("2023-12-31 00:00:00"), // before everything
      Timestamp.valueOf("2024-01-01 00:15:00"), // mid-stream
      Timestamp.valueOf("2024-01-02 00:00:00")) // after everything
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Timestamp)]
    val q4 = fs.streamingPointInTime("e2e_loop_pit",
      in.toDF().toDF("action_id", "as_of"), "action_id", "as_of",
      Seq("reward"), s"$root/pit_out", s"$root/ckpt_pit",
      Trigger.ProcessingTime("0 seconds"))
    try {
      in.addData(for { e <- entities; t <- asOfs } yield (e, t))
      q4.processAllAvailable()
    } finally q4.stop()
    val servedPit = spark.read.parquet(s"$root/pit_out")
      .select("action_id", "as_of", "asof_reward")
      .as[(Long, Timestamp, Option[Double])].collect()
    assert(servedPit.length == entities.size * asOfs.size)
    val trainRows = train
      .select(col("action").cast("long"), col("ts"), col("reward"))
      .as[(Long, Timestamp, Double)].collect()
    servedPit.foreach { case (e, asOf, got) =>
      val eligible = trainRows
        .filter(r => r._1 == e && !r._2.after(asOf))
      val want =
        if (eligible.isEmpty) None
        else Some(eligible.maxBy(_._2.getTime)._3)
      assert(got == want,
        s"PIT($e, $asOf): got $got want $want — future read or miss")
    }

    // ---- 5. retrain (30-min loop) → model table via keyed upsert:
    // wave 1 fits on the first request's rows only, wave 2 on the full
    // table with a later retrain stamp; latest-per-action must win
    val modelPath = s"$root/model"
    def paramRows(m: LinUcb.Model, at: Timestamp) =
      m.actions.map(a => (a.action, at, a.theta.toSeq, a.n))
    val fit1 = LinUcb.fit(train.filter(col("ts") <
        lit(Timestamp.valueOf("2024-01-01 00:10:00"))),
      "action", "obs", "reward", dim, alpha = 0.3, lambda = 1.0)
    val fit2 = LinUcb.fit(train, "action", "obs", "reward", dim,
      alpha = 0.3, lambda = 1.0)
    val t1 = Timestamp.valueOf("2024-01-02 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-03 00:00:00")
    val mIn = MemoryStream[(Int, Timestamp, Seq[Double], Long)]
    val q5 = Streams.upsertLoop(
      mIn.toDF().toDF("action", "ts", "theta", "n"),
      modelPath, "action", "ts", numBuckets = 4,
      s"$root/ckpt_model", Trigger.ProcessingTime("0 seconds"))
    try {
      mIn.addData(paramRows(fit1, t1))
      q5.processAllAvailable()
      mIn.addData(paramRows(fit2, t2))
      q5.processAllAvailable()
    } finally q5.stop()
    val modelTable = spark.read.parquet(modelPath)
      .select("action", "ts", "theta", "n")
      .as[(Int, Timestamp, Seq[Double], Long)].collect()
    // latest-per-action: every surviving row is wave 2's
    assert(modelTable.length == fit2.actions.size)
    assert(modelTable.forall(_._2 == t2), "stale wave-1 params survived")
    val wantTheta = fit2.actions
      .map(a => a.action -> a.theta.toSeq).toMap
    modelTable.foreach { case (a, _, theta, _) =>
      assert(theta == wantTheta(a), s"action $a: upserted theta drifted")
    }
    // conservation: every served prediction step reached the retrained
    // model's sufficient statistics — the loop is closed
    assert(modelTable.map(_._4).sum == 6L)
    } finally spark.sql("DROP TABLE IF EXISTS e2e_loop_pit")
  }
}
