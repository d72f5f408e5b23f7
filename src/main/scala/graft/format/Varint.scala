package graft.format

/** Exception for any structural corruption in a column file.
  * Mirrors the contract of `ColumnFileException` (reference:
  * src/columnfile.h:86-88): malformed input must raise a clean error,
  * never crash.
  */
final class CorruptColumnFileException(msg: String) extends RuntimeException(msg)

/** Growable byte buffer used by the encoders. Plain array-backed builder;
  * avoids java.io.ByteArrayOutputStream synchronization overhead.
  */
final class ByteBuf(initialCapacity: Int = 64) {
  private[format] var buf: Array[Byte] = new Array[Byte](math.max(initialCapacity, 8))
  private[format] var len: Int = 0

  def size: Int = len

  private def ensure(n: Int): Unit =
    if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }

  def addByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def append(bytes: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(bytes, off, buf, len, n); len += n
  }
  def append(bytes: Array[Byte]): Unit = append(bytes, 0, bytes.length)

  def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)

  def reset(): Unit = len = 0
}

/** Mutable read cursor over a byte array. */
final class Cursor(var pos: Int)

/** Variable-length integer codec for unsigned 32-bit values.
  *
  * Format (reference spec: src/columnfile.h:15-26, impl
  * src/columnfile-internal.h:28-87): the first byte carries 7 payload bits
  * when the value fits in one byte; otherwise the first byte carries 6 bits
  * with bit 7 set (so the first byte is always < 0xc0 — this keeps varint
  * starts distinguishable from the 0xc0..0xff control bytes of the value
  * encoding), and each subsequent byte carries 7 bits at shifts 6, 13, 20,
  * 27. The fifth byte may carry at most 5 bits (uint32 range); anything
  * larger is a corruption error.
  */
object Varint {
  final val MaxValue: Long = 0xFFFFFFFFL

  /** Encode an unsigned value in [0, 2^32). */
  def put(out: ByteBuf, value: Long): Unit = {
    require(value >= 0L && value <= MaxValue, s"varint out of range: $value")
    val v = value
    if (v < (1L << 7)) {
      out.addByte(v.toInt)
    } else if (v < (1L << 13)) {
      out.addByte(((v & 0x3f) | 0x80).toInt)
      out.addByte((v >>> 6).toInt)
    } else if (v < (1L << 20)) {
      out.addByte(((v & 0x3f) | 0x80).toInt)
      out.addByte((((v >>> 6) & 0x7f) | 0x80).toInt)
      out.addByte((v >>> 13).toInt)
    } else if (v < (1L << 27)) {
      out.addByte(((v & 0x3f) | 0x80).toInt)
      out.addByte((((v >>> 6) & 0x7f) | 0x80).toInt)
      out.addByte((((v >>> 13) & 0x7f) | 0x80).toInt)
      out.addByte((v >>> 20).toInt)
    } else {
      out.addByte(((v & 0x3f) | 0x80).toInt)
      out.addByte((((v >>> 6) & 0x7f) | 0x80).toInt)
      out.addByte((((v >>> 13) & 0x7f) | 0x80).toInt)
      out.addByte((((v >>> 20) & 0x7f) | 0x80).toInt)
      out.addByte((v >>> 27).toInt)
    }
  }

  /** Decode an unsigned value, advancing the cursor. */
  def get(data: Array[Byte], cur: Cursor): Long = {
    var p = cur.pos
    def byteAt(i: Int): Int = {
      if (i >= data.length)
        throw new CorruptColumnFileException("truncated varint")
      data(i) & 0xff
    }
    var b = byteAt(p); p += 1
    var result: Long = b & 0x7f
    if (b >= 0x80) {
      b = byteAt(p); p += 1
      result |= (b & 0x7f).toLong << 6
      if (b >= 0x80) {
        b = byteAt(p); p += 1
        result |= (b & 0x7f).toLong << 13
        if (b >= 0x80) {
          b = byteAt(p); p += 1
          result |= (b & 0x7f).toLong << 20
          if (b >= 0x80) {
            b = byteAt(p); p += 1
            if (b > 0x1f)
              throw new CorruptColumnFileException(
                "corrupt input: integer out of range")
            result |= b.toLong << 27
          }
        }
      }
    }
    cur.pos = p
    result
  }

  /** Zigzag-encode a signed 32-bit value to unsigned (reference:
    * src/columnfile-internal.h:83-87). Defined and tested for parity; the
    * file format itself only uses unsigned varints.
    */
  def zigzag(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & MaxValue

  /** Inverse of [[zigzag]] (reference: src/columnfile-internal.h:54-57). */
  def unzigzag(u: Long): Int = ((u >>> 1).toInt) ^ -((u & 1L).toInt)
}
