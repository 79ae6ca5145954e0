package graft.io

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format primitives (encoding spec:
  * protobuf.dev/programming-guides/encoding). Just enough to serialize
  * and parse the three public TensorFlow messages the reference
  * pipeline exchanges — `tf.train.Example`, `TensorProto`,
  * `TensorShapeProto` (reference: ingester_component.py:42-60 writes,
  * trainer_component.py:42-69 parses) — with zero dependencies.
  *
  * Wire types used: 0 = varint, 2 = length-delimited, 5 = fixed32.
  */
object ProtoWire {

  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
      this
    }

    private def tag(fieldNo: Int, wireType: Int): Writer =
      writeVarint(((fieldNo.toLong) << 3) | wireType)

    def int64Field(fieldNo: Int, v: Long): Writer =
      { tag(fieldNo, 0); writeVarint(v) }

    def bytesField(fieldNo: Int, b: Array[Byte]): Writer = {
      tag(fieldNo, 2); writeVarint(b.length.toLong); out.write(b); this
    }

    def stringField(fieldNo: Int, s: String): Writer =
      bytesField(fieldNo, s.getBytes("UTF-8"))

    def messageField(fieldNo: Int, m: Writer): Writer =
      bytesField(fieldNo, m.toBytes)

    /** Packed repeated float (wire type 2 of little-endian fixed32s). */
    def packedFloats(fieldNo: Int, vs: Array[Float]): Writer = {
      val b = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putFloat)
      bytesField(fieldNo, b.array())
    }

    /** Packed repeated int64 (wire type 2 of varints). */
    def packedVarints(fieldNo: Int, vs: Array[Long]): Writer = {
      val inner = new Writer
      vs.foreach(inner.writeVarint)
      bytesField(fieldNo, inner.toBytes)
    }

    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Streaming reader over one serialized message. Callers dispatch on
    * (fieldNo, wireType) and must consume every field they encounter
    * (skipping is supported for forward-compat).
    */
  final class Reader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start

    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    /** Returns (fieldNo, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readLengthDelimited(): Reader = {
      val len = readVarint().toInt
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      b
    }

    def readString(): String = new String(readBytes(), "UTF-8")

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case other =>
        throw new IllegalArgumentException(s"wire type $other")
    }
  }
}
