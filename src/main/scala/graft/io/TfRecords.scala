package graft.io

import java.io.BufferedOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Byte-faithful TFRecord interchange for the reference's trajectory
  * records — closing the one documented format gap (SURVEY §1.2/A16):
  * round 1 swapped parquet for TFRecord; this module writes and reads
  * the REAL format so a user porting the reference pipeline
  * byte-for-byte can exchange files with it.
  *
  * Byte layout mirrors ingester_component.py:42-81: one
  * `tf.train.Example` per trajectory, each of the 7 features a
  * one-element BytesList holding a `tf.io.serialize_tensor` blob, with
  * the trainer's dtypes (trainer_component.py:50-69): int32 for
  * step_type/action/next_step_type, float32 for observation (2-D
  * [n, rank_k]), policy_info, reward, discount. Features are written in
  * the reference's insertion order.
  *
  * Scale design: one .tfrecord file per partition, written inside the
  * task (no driver collect); read parallelism is one task per file via
  * the binaryFile source (TFRecord is not splittable — its framing has
  * no sync markers — so file count IS the parallelism knob; the
  * upstream repartition picks it). Paths here are java.nio (local FS /
  * NFS); a cluster deployment swaps in the Hadoop FileSystem API at the
  * two marked seams.
  */
object TfRecords {

  final case class ObsRow(observation_batch: Seq[Double])
  final case class TrajRecord(step_type: Seq[Long], observation: Seq[ObsRow],
                              action: Seq[Long], policy_info: Seq[Double],
                              next_step_type: Seq[Long], reward: Seq[Double],
                              discount: Seq[Double])

  private val featureOrder = Seq("step_type", "observation", "action",
    "policy_info", "next_step_type", "reward", "discount")

  /** Serialize one trajectory to the reference's Example bytes. */
  def encodeExample(t: TrajRecord): Array[Byte] = {
    import TensorProtoCodec._
    val n = t.observation.length.toLong
    val k = if (t.observation.isEmpty) 0L
      else t.observation.head.observation_batch.length.toLong
    val obsFlat = t.observation
      .flatMap(_.observation_batch.map(_.toFloat)).toArray
    val tensors: Map[String, Tensor] = Map(
      "step_type" -> fromInts(t.step_type.map(_.toInt).toArray,
        Seq(t.step_type.length.toLong)),
      "observation" -> fromFloats(obsFlat, Seq(n, k)),
      "action" -> fromInts(t.action.map(_.toInt).toArray,
        Seq(t.action.length.toLong)),
      "policy_info" -> fromFloats(t.policy_info.map(_.toFloat).toArray,
        Seq(t.policy_info.length.toLong)),
      "next_step_type" -> fromInts(t.next_step_type.map(_.toInt).toArray,
        Seq(t.next_step_type.length.toLong)),
      "reward" -> fromFloats(t.reward.map(_.toFloat).toArray,
        Seq(t.reward.length.toLong)),
      "discount" -> fromFloats(t.discount.map(_.toFloat).toArray,
        Seq(t.discount.length.toLong)))
    TfExampleCodec.encode(TfExampleCodec.Example(
      featureOrder.map(f => f -> TfExampleCodec.BytesList(
        Seq(TensorProtoCodec.encode(tensors(f)))))))
  }

  /** Parse the reference's Example bytes back to a trajectory. */
  def decodeExample(bytes: Array[Byte]): TrajRecord = {
    val ex = TfExampleCodec.decode(bytes)
    def ints(name: String) =
      ex.tensor(name).ints.map(_.toLong).toSeq
    def floats(name: String) =
      ex.tensor(name).floats.map(_.toDouble).toSeq
    val obs = ex.tensor("observation")
    val k = obs.shape.lift(1).getOrElse(0L).toInt
    val obsRows =
      if (k == 0) Seq.empty[ObsRow]
      else obs.floats.map(_.toDouble).grouped(k)
        .map(g => ObsRow(g.toSeq)).toSeq
    TrajRecord(ints("step_type"), obsRows, ints("action"),
      floats("policy_info"), ints("next_step_type"), floats("reward"),
      floats("discount"))
  }

  /** Write trajectories (the [[graft.ml.Simulation.trajectories]]
    * schema) as TFRecord part files under `dir` — the A16 record sink
    * with real bytes.
    */
  def writeTrajectories(df: DataFrame, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val spark = df.sparkSession
    import spark.implicits._
    df.select(featureOrder.map(col): _*).as[TrajRecord]
      .foreachPartition { (it: Iterator[TrajRecord]) =>
        if (it.hasNext) {
          val part = TaskContext.get().partitionId()
          val path = Paths.get(dir, f"part-$part%05d.tfrecord")
          // seam: cluster FS would open via Hadoop FileSystem here
          val out = new BufferedOutputStream(
            Files.newOutputStream(path))
          try it.foreach(t =>
            TfRecordFrames.writeRecord(out, encodeExample(t)))
          finally out.close()
        }
      }
  }

  /** Read TFRecord trajectory files back as a typed Dataset (one task
    * per file; binaryFile loads each file whole, bounded by the write
    * side's partition size).
    */
  def readTrajectories(spark: SparkSession, dir: String)
      : Dataset[TrajRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord")
      .load(dir) // seam: cluster FS path resolution happens here
      .select("content").as[Array[Byte]]
      .flatMap(bytes => TfRecordFrames.readAll(bytes).map(decodeExample))
  }
}
