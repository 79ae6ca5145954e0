package graft.io

/** Encode/decode `tf.train.Example` (public schema:
  * tensorflow/core/example/example.proto + feature.proto):
  *
  *   Example  { Features features = 1; }
  *   Features { map<string, Feature> feature = 1; }   // entry: key=1,
  *                                                    //        value=2
  *   Feature  { oneof kind { BytesList bytes_list = 1;
  *                           FloatList float_list = 2;
  *                           Int64List int64_list = 3; } }
  *   *List    { repeated ... value = 1; }  // floats/ints packed
  *
  * The reference builds Examples whose every Feature is a one-element
  * BytesList holding a serialized tensor (ingester_component.py:42-60);
  * [[TfRecords]] reproduces that exact nesting. Features are written in
  * caller order (Python dicts preserve insertion order, so this matches
  * the reference writer's layout).
  */
object TfExampleCodec {

  sealed trait FeatureValue
  final case class BytesList(values: Seq[Array[Byte]]) extends FeatureValue
  final case class FloatList(values: Array[Float]) extends FeatureValue
  final case class Int64List(values: Array[Long]) extends FeatureValue

  final case class Example(features: Seq[(String, FeatureValue)]) {
    def apply(name: String): FeatureValue =
      features.find(_._1 == name).getOrElse(
        throw new NoSuchElementException(name))._2
    /** The single serialized-tensor blob of a one-element BytesList
      * feature — the reference's universal value shape.
      */
    def tensor(name: String): TensorProtoCodec.Tensor =
      apply(name) match {
        case BytesList(Seq(one)) => TensorProtoCodec.decode(one)
        case other => throw new IllegalArgumentException(
          s"feature $name is not a 1-element bytes_list: $other")
      }
  }

  def encode(ex: Example): Array[Byte] = {
    val featuresMsg = new ProtoWire.Writer
    ex.features.foreach { case (name, value) =>
      val featureMsg = new ProtoWire.Writer
      value match {
        case BytesList(vs) =>
          val list = new ProtoWire.Writer
          vs.foreach(list.bytesField(1, _))
          featureMsg.messageField(1, list)
        case FloatList(vs) =>
          featureMsg.messageField(2,
            new ProtoWire.Writer().packedFloats(1, vs))
        case Int64List(vs) =>
          featureMsg.messageField(3,
            new ProtoWire.Writer().packedVarints(1, vs))
      }
      val entry = new ProtoWire.Writer()
        .stringField(1, name)
        .messageField(2, featureMsg)
      featuresMsg.messageField(1, entry)
    }
    new ProtoWire.Writer().messageField(1, featuresMsg).toBytes
  }

  def decode(bytes: Array[Byte]): Example = {
    val out = Seq.newBuilder[(String, FeatureValue)]
    val r = new ProtoWire.Reader(bytes)
    while (r.hasMore) r.readTag() match {
      case (1, 2) => // Features
        val fr = r.readLengthDelimited()
        while (fr.hasMore) fr.readTag() match {
          case (1, 2) => // map entry
            val er = fr.readLengthDelimited()
            var key = ""
            var value: FeatureValue = BytesList(Seq.empty)
            while (er.hasMore) er.readTag() match {
              case (1, 2) => key = er.readString()
              case (2, 2) => value = decodeFeature(er.readLengthDelimited())
              case (_, wt) => er.skip(wt)
            }
            out += ((key, value))
          case (_, wt) => fr.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    Example(out.result())
  }

  private def decodeFeature(r: ProtoWire.Reader): FeatureValue = {
    var value: FeatureValue = BytesList(Seq.empty)
    while (r.hasMore) r.readTag() match {
      case (1, 2) => // BytesList
        val lr = r.readLengthDelimited()
        val vs = Seq.newBuilder[Array[Byte]]
        while (lr.hasMore) lr.readTag() match {
          case (1, 2) => vs += lr.readBytes()
          case (_, wt) => lr.skip(wt)
        }
        value = BytesList(vs.result())
      case (2, 2) => // FloatList (packed or unpacked fixed32s)
        val lr = r.readLengthDelimited()
        val vs = Array.newBuilder[Float]
        while (lr.hasMore) lr.readTag() match {
          case (1, 2) =>
            val packed = lr.readBytes()
            val b = java.nio.ByteBuffer.wrap(packed)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            while (b.remaining() >= 4) vs += b.getFloat
          case (_, wt) => lr.skip(wt)
        }
        value = FloatList(vs.result())
      case (3, 2) => // Int64List (packed varints)
        val lr = r.readLengthDelimited()
        val vs = Array.newBuilder[Long]
        while (lr.hasMore) lr.readTag() match {
          case (1, 2) =>
            val pr = lr.readLengthDelimited()
            while (pr.hasMore) vs += pr.readVarint()
          case (_, wt) => lr.skip(wt)
        }
        value = Int64List(vs.result())
      case (_, wt) => r.skip(wt)
    }
    value
  }
}
