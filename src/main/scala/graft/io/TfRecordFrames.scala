package graft.io

import java.io.{InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

/** TFRecord container framing (public spec,
  * tensorflow/core/lib/io/record_writer.h — also documented under
  * "TFRecords format details" in the TF data guide):
  *
  *   uint64  length          (little-endian)
  *   uint32  masked_crc32c(length bytes)
  *   byte    data[length]
  *   uint32  masked_crc32c(data)
  *
  * with masked_crc = rotr(crc32c, 15) + 0xa282ead8 (uint32 wrap).
  * `java.util.zip.CRC32C` (Castagnoli, JDK 9+) supplies the checksum —
  * no dependency needed.
  */
object TfRecordFrames {

  private val Mask = 0xa282ead8L

  def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C
    c.update(bytes)
    val crc = c.getValue // unsigned 32-bit in a long
    val rot = ((crc >>> 15) | (crc << 17)) & 0xffffffffL
    ((rot + Mask) & 0xffffffffL).toInt
  }

  def writeRecord(out: OutputStream, data: Array[Byte]): Unit = {
    val header = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    header.put(lenBytes).putInt(maskedCrc(lenBytes))
    out.write(header.array())
    out.write(data)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(maskedCrc(data)).array())
  }

  /** Read one record; None at clean EOF. Throws on checksum mismatch or
    * truncation (corrupt files should fail loudly, not yield rows).
    */
  def readRecord(in: InputStream): Option[Array[Byte]] = {
    val lenBytes = new Array[Byte](8)
    val first = in.read(lenBytes)
    if (first == -1) return None
    if (first != 8) readFully(in, lenBytes, first)
    val lenCrc = new Array[Byte](4)
    readFully(in, lenCrc, 0)
    val expectLenCrc = ByteBuffer.wrap(lenCrc)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require(maskedCrc(lenBytes) == expectLenCrc,
      "TFRecord length checksum mismatch")
    val len = ByteBuffer.wrap(lenBytes)
      .order(ByteOrder.LITTLE_ENDIAN).getLong.toInt
    val data = new Array[Byte](len)
    readFully(in, data, 0)
    val dataCrc = new Array[Byte](4)
    readFully(in, dataCrc, 0)
    require(maskedCrc(data) == ByteBuffer.wrap(dataCrc)
        .order(ByteOrder.LITTLE_ENDIAN).getInt,
      "TFRecord data checksum mismatch")
    Some(data)
  }

  def readAll(bytes: Array[Byte]): Iterator[Array[Byte]] = {
    val in = new java.io.ByteArrayInputStream(bytes)
    Iterator.continually(readRecord(in)).takeWhile(_.isDefined)
      .map(_.get)
  }

  private def readFully(in: InputStream, buf: Array[Byte],
                        from: Int): Unit = {
    var off = from
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      require(n != -1, "truncated TFRecord stream")
      off += n
    }
  }
}
