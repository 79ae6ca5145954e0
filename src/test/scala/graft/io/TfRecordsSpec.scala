package graft.io

import java.nio.file.Files

import graft.SparkSpec
import graft.ml.{RankKFactorizer, Simulation}

/** TFRecord byte-format interchange (A8/A9/A16): framing checksums,
  * protobuf golden bytes, Example/TensorProto round-trips, and the
  * Spark write→read path over real trajectory data.
  */
class TfRecordsSpec extends SparkSpec {
  import spark.implicits._

  test("CRC32C matches the Castagnoli check value; masking wraps") {
    val c = new java.util.zip.CRC32C
    c.update("123456789".getBytes("ASCII"))
    assert(c.getValue == 0xe3069283L) // published CRC-32C check value
    // masked_crc = rotr(crc,15) + 0xa282ead8 (uint32 wrap), spot-check
    // the empty-input case where crc32c = 0.
    assert(TfRecordFrames.maskedCrc(Array.empty) == 0xa282ead8)
  }

  test("TFRecord framing round-trips and detects corruption") {
    val recs = Seq("alpha".getBytes, Array.empty[Byte],
      Array.fill(1000)(7.toByte))
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach(TfRecordFrames.writeRecord(out, _))
    val back = TfRecordFrames.readAll(out.toByteArray).toSeq
    assert(back.map(_.toSeq) == recs.map(_.toSeq))
    val corrupt = out.toByteArray.clone()
    corrupt(14) = (corrupt(14) ^ 0xff).toByte // flip a data byte
    intercept[IllegalArgumentException] {
      TfRecordFrames.readAll(corrupt).toSeq
    }
  }

  test("TensorProto golden bytes: int32 [1] tensor of value 1") {
    // 08 03        dtype = DT_INT32
    // 12 04 12 02 08 01   tensor_shape { dim { size: 1 } }
    // 22 04 01 00 00 00   tensor_content = int32 LE 1
    val t = TensorProtoCodec.fromInts(Array(1), Seq(1L))
    val expected = Array(0x08, 0x03, 0x12, 0x04, 0x12, 0x02, 0x08, 0x01,
      0x22, 0x04, 0x01, 0x00, 0x00, 0x00).map(_.toByte)
    assert(TensorProtoCodec.encode(t).toSeq == expected.toSeq)
  }

  test("TensorProto round-trips every dtype and a 2-D shape") {
    import TensorProtoCodec._
    val f = decode(encode(fromFloats(Array(1.5f, -2f), Seq(2L))))
    assert(f.dtype == DtFloat && f.shape == Seq(2L) &&
      f.floats.toSeq == Seq(1.5f, -2f))
    val d = decode(encode(fromDoubles(Array(math.Pi), Seq(1L))))
    assert(d.doubles.toSeq == Seq(math.Pi))
    val i = decode(encode(fromInts(Array(3, -4), Seq(2L))))
    assert(i.ints.toSeq == Seq(3, -4))
    val l = decode(encode(fromLongs(Array(1L << 40), Seq(1L))))
    assert(l.longs.toSeq == Seq(1L << 40))
    val m = decode(encode(fromFloats(Array(1f, 2f, 3f, 4f, 5f, 6f),
      Seq(2L, 3L))))
    assert(m.shape == Seq(2L, 3L) && m.floats.length == 6)
  }

  test("Example round-trips all three list kinds, preserving order") {
    import TfExampleCodec._
    val ex = Example(Seq(
      "b" -> BytesList(Seq("x".getBytes, "yz".getBytes)),
      "f" -> FloatList(Array(0.5f, 1f)),
      "i" -> Int64List(Array(-1L, 300L))))
    val back = decode(encode(ex))
    assert(back.features.map(_._1) == Seq("b", "f", "i"))
    assert(back("b").asInstanceOf[BytesList].values.map(_.toSeq) ==
      Seq("x".getBytes.toSeq, "yz".getBytes.toSeq))
    assert(back("f").asInstanceOf[FloatList].values.toSeq ==
      Seq(0.5f, 1f))
    assert(back("i").asInstanceOf[Int64List].values.toSeq ==
      Seq(-1L, 300L))
  }

  test("trajectory Example encode/decode keeps the reference layout") {
    val t = TfRecords.TrajRecord(
      step_type = Seq(1L, 1L),
      observation = Seq(TfRecords.ObsRow(Seq(0.25, 0.5)),
        TfRecords.ObsRow(Seq(0.75, 1.0))),
      action = Seq(3L, 7L), policy_info = Seq.empty,
      next_step_type = Seq(1L, 1L), reward = Seq(0.5, 0.25),
      discount = Seq(1.0, 1.0))
    val back = TfRecords.decodeExample(TfRecords.encodeExample(t))
    assert(back == t) // all values here are exact in float32
    // feature order matches the reference writer's dict order
    val ex = TfExampleCodec.decode(TfRecords.encodeExample(t))
    assert(ex.features.map(_._1) == Seq("step_type", "observation",
      "action", "policy_info", "next_step_type", "reward", "discount"))
    // dtypes match what the trainer parses (int32 / float32)
    assert(ex.tensor("action").dtype == TensorProtoCodec.DtInt32)
    assert(ex.tensor("reward").dtype == TensorProtoCodec.DtFloat)
    assert(ex.tensor("observation").shape == Seq(2L, 2L))
  }

  test("Spark write→read round-trips generated trajectories (A16)") {
    val dir = Files.createTempDirectory("tfrec").toString
    val ratings = Seq((1, 1, 4.0f), (1, 2, 3.0f), (2, 1, 5.0f),
      (2, 3, 1.0f), (3, 2, 2.0f), (3, 3, 4.5f))
      .toDF("user_id", "item_id", "rating")
    val factors = RankKFactorizer.factorize(ratings, rank = 2,
      seed = 42L, maxIter = 2)
    val traj = Simulation.generateTrajectories(spark, factors,
      steps = 6, batchSize = 3, numActions = 3, seed = 42L).cache()
    TfRecords.writeTrajectories(traj, dir)
    val back = TfRecords.readTrajectories(spark, dir)
    assert(back.count() == traj.count())
    // actions are integers → exact through int32; rewards survive as
    // float32, so compare after an identical float32 round-trip.
    val wantActions = traj.select("action").as[Seq[Long]]
      .collect().map(_.mkString(",")).sorted.toSeq
    val gotActions = back.select("action").as[Seq[Long]]
      .collect().map(_.mkString(",")).sorted.toSeq
    assert(gotActions == wantActions)
    val wantR = traj.select("reward").as[Seq[Double]].collect()
      .map(_.map(_.toFloat.toDouble).mkString(",")).sorted.toSeq
    val gotR = back.select("reward").as[Seq[Double]].collect()
      .map(_.mkString(",")).sorted.toSeq
    assert(gotR == wantR)
  }
}
