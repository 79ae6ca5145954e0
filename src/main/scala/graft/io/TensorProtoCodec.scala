package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Encode/decode the bytes `tf.io.serialize_tensor` produces — a
  * serialized `tensorflow.TensorProto` (public schema:
  * tensorflow/core/framework/tensor.proto). The reference stores one
  * such blob per trajectory column inside each Example
  * (ingester_component.py:42-47) and parses them back with
  * `tf.io.parse_tensor` (trainer_component.py:50-69).
  *
  * Field layout reproduced (numeric tensors, as TF's
  * `AsProtoTensorContent` writes them):
  *   1 dtype       varint   (DT_FLOAT=1, DT_DOUBLE=2, DT_INT32=3,
  *                           DT_INT64=9)
  *   2 tensor_shape message  TensorShapeProto{repeated Dim dim = 2;
  *                           Dim{int64 size = 1}} — always present,
  *                           empty for scalars
  *   4 tensor_content bytes  raw little-endian packed values
  */
object TensorProtoCodec {

  val DtFloat = 1
  val DtDouble = 2
  val DtInt32 = 3
  val DtInt64 = 9

  /** A dense tensor: dtype, shape (row-major), raw LE content. */
  final case class Tensor(dtype: Int, shape: Seq[Long],
                          content: Array[Byte]) {
    private def le = ByteBuffer.wrap(content)
      .order(ByteOrder.LITTLE_ENDIAN)
    def floats: Array[Float] = {
      val b = le.asFloatBuffer; val a = new Array[Float](b.remaining)
      b.get(a); a
    }
    def doubles: Array[Double] = {
      val b = le.asDoubleBuffer; val a = new Array[Double](b.remaining)
      b.get(a); a
    }
    def ints: Array[Int] = {
      val b = le.asIntBuffer; val a = new Array[Int](b.remaining)
      b.get(a); a
    }
    def longs: Array[Long] = {
      val b = le.asLongBuffer; val a = new Array[Long](b.remaining)
      b.get(a); a
    }
  }

  def fromFloats(vs: Array[Float], shape: Seq[Long]): Tensor = {
    val b = ByteBuffer.allocate(vs.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putFloat)
    Tensor(DtFloat, shape, b.array())
  }

  def fromInts(vs: Array[Int], shape: Seq[Long]): Tensor = {
    val b = ByteBuffer.allocate(vs.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putInt)
    Tensor(DtInt32, shape, b.array())
  }

  def fromLongs(vs: Array[Long], shape: Seq[Long]): Tensor = {
    val b = ByteBuffer.allocate(vs.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putLong)
    Tensor(DtInt64, shape, b.array())
  }

  def fromDoubles(vs: Array[Double], shape: Seq[Long]): Tensor = {
    val b = ByteBuffer.allocate(vs.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble)
    Tensor(DtDouble, shape, b.array())
  }

  def encode(t: Tensor): Array[Byte] = {
    val shapeMsg = new ProtoWire.Writer
    t.shape.foreach { size =>
      shapeMsg.messageField(2,
        new ProtoWire.Writer().int64Field(1, size))
    }
    new ProtoWire.Writer()
      .int64Field(1, t.dtype.toLong)
      .messageField(2, shapeMsg)
      .bytesField(4, t.content)
      .toBytes
  }

  def decode(bytes: Array[Byte]): Tensor = {
    val r = new ProtoWire.Reader(bytes)
    var dtype = 0
    var shape = Seq.empty[Long]
    var content = Array.empty[Byte]
    while (r.hasMore) {
      r.readTag() match {
        case (1, 0) => dtype = r.readVarint().toInt
        case (2, 2) =>
          val sr = r.readLengthDelimited()
          val dims = Seq.newBuilder[Long]
          while (sr.hasMore) sr.readTag() match {
            case (2, 2) =>
              val dr = sr.readLengthDelimited()
              var size = 0L
              while (dr.hasMore) dr.readTag() match {
                case (1, 0) => size = dr.readVarint()
                case (_, wt) => dr.skip(wt)
              }
              dims += size
            case (_, wt) => sr.skip(wt)
          }
          shape = dims.result()
        case (4, 2) => content = r.readBytes()
        case (_, wt) => r.skip(wt)
      }
    }
    Tensor(dtype, shape, content)
  }
}
