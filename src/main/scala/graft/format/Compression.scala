package graft.format

import java.util.zip.{Deflater, Inflater}

/** Per-column block compression codecs.
  *
  * Numeric ids and framing follow the reference format
  * (src/columnfile.h:65-84, src/columnfile-writer.cc:320-397):
  * snappy blocks are self-describing; lz4 / lzma / zlib blocks are
  * prefixed with a varint uncompressed size. The reference parallelizes
  * zlib deflate across threads (src/zlib-parallel.cc) — on Spark the unit
  * of parallelism is the task/partition, so each block compresses on the
  * task's own thread.
  */
object Compression {
  final val None: Int = 0
  final val Snappy: Int = 1
  final val LZ4: Int = 2
  final val LZMA: Int = 3
  final val ZLIB: Int = 4

  /** Extension beyond the reference's 0–4 (src/columnfile.h:65-84):
    * zstd sits between lz4's speed and lzma's ratio and is the modern
    * large-scale default; level 3 matches Spark/Parquet's own shuffle
    * and storage defaults. Files written with it are readable only by
    * this engine — the codec id rides the same per-chunk byte the
    * reference uses, so reference-compatible ids stay untouched.
    */
  final val ZSTD: Int = 5
  final val Default: Int = LZ4 // reference default: src/columnfile.h:83

  def fromName(name: String): Int = name.toLowerCase match {
    case "none"             => None
    case "snappy"           => Snappy
    case "lz4"              => LZ4
    case "lzma" | "xz"      => LZMA
    case "zlib" | "deflate" => ZLIB
    case "zstd"             => ZSTD
    case other =>
      throw new IllegalArgumentException(s"unknown compression scheme: $other")
  }

  def name(codec: Int): String = codec match {
    case None   => "none"
    case Snappy => "snappy"
    case LZ4    => "lz4"
    case LZMA   => "lzma"
    case ZLIB   => "zlib"
    case ZSTD   => "zstd"
    case other  => s"unknown($other)"
  }

  private def lz4Factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  /** Compress an encoded column block. Returns a new array. */
  def compress(codec: Int, data: Array[Byte], off: Int, len: Int): Array[Byte] =
    codec match {
      case None =>
        java.util.Arrays.copyOfRange(data, off, off + len)
      case Snappy =>
        org.xerial.snappy.Snappy.rawCompress(
          java.util.Arrays.copyOfRange(data, off, off + len), len)
      case LZ4 =>
        val head = new ByteBuf(8)
        Varint.put(head, len.toLong)
        val comp = lz4Factory.fastCompressor()
        val max = comp.maxCompressedLength(len)
        val out = new Array[Byte](head.size + max)
        System.arraycopy(head.buf, 0, out, 0, head.size)
        val n = comp.compress(data, off, len, out, head.size, max)
        java.util.Arrays.copyOf(out, head.size + n)
      case LZMA =>
        val head = new ByteBuf(8)
        Varint.put(head, len.toLong)
        val bos = new java.io.ByteArrayOutputStream(len / 4 + 64)
        bos.write(head.buf, 0, head.size)
        val xz = new org.tukaani.xz.XZOutputStream(
          bos, new org.tukaani.xz.LZMA2Options(1))
        xz.write(data, off, len)
        xz.finish()
        bos.toByteArray
      case ZLIB =>
        val head = new ByteBuf(8)
        Varint.put(head, len.toLong)
        val deflater = new Deflater()
        try {
          deflater.setInput(data, off, len)
          deflater.finish()
          val bos = new java.io.ByteArrayOutputStream(len / 4 + 64)
          bos.write(head.buf, 0, head.size)
          val tmp = new Array[Byte](8192)
          while (!deflater.finished()) {
            val n = deflater.deflate(tmp)
            bos.write(tmp, 0, n)
          }
          bos.toByteArray
        } finally deflater.end()
      case ZSTD =>
        val head = new ByteBuf(8)
        Varint.put(head, len.toLong)
        val src = java.util.Arrays.copyOfRange(data, off, off + len)
        val comp = com.github.luben.zstd.Zstd.compress(src, 3)
        val out = new Array[Byte](head.size + comp.length)
        System.arraycopy(head.buf, 0, out, 0, head.size)
        System.arraycopy(comp, 0, out, head.size, comp.length)
        out
      case other =>
        throw new CorruptColumnFileException(s"unknown compression scheme: $other")
    }

  /** Decompress a column block back to the encoded byte stream. */
  def decompress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case None => data
    case Snappy =>
      if (!org.xerial.snappy.Snappy.isValidCompressedBuffer(data))
        throw new CorruptColumnFileException("snappy: invalid compressed data")
      org.xerial.snappy.Snappy.uncompress(data)
    case LZ4 =>
      val cur = new Cursor(0)
      val rawLen = Varint.get(data, cur)
      if (rawLen > Int.MaxValue.toLong)
        throw new CorruptColumnFileException("lz4: unreasonable block size")
      val out = new Array[Byte](rawLen.toInt)
      try {
        lz4Factory
          .safeDecompressor()
          .decompress(data, cur.pos, data.length - cur.pos, out, 0)
      } catch {
        case e: net.jpountz.lz4.LZ4Exception =>
          throw new CorruptColumnFileException(s"lz4: ${e.getMessage}")
      }
      out
    case LZMA =>
      val cur = new Cursor(0)
      val rawLen = Varint.get(data, cur)
      try {
        val in = new org.tukaani.xz.XZInputStream(
          new java.io.ByteArrayInputStream(data, cur.pos, data.length - cur.pos))
        val out = in.readNBytes(rawLen.toInt)
        if (out.length != rawLen)
          throw new CorruptColumnFileException("lzma: decompressed length mismatch")
        out
      } catch {
        case e: java.io.IOException =>
          throw new CorruptColumnFileException(s"lzma: ${e.getMessage}")
      }
    case ZLIB =>
      val cur = new Cursor(0)
      val rawLen = Varint.get(data, cur)
      val inflater = new Inflater()
      try {
        inflater.setInput(data, cur.pos, data.length - cur.pos)
        val out = new Array[Byte](rawLen.toInt)
        var total = 0
        while (total < out.length && !inflater.finished()) {
          val n = inflater.inflate(out, total, out.length - total)
          if (n == 0 && inflater.needsInput())
            throw new CorruptColumnFileException("deflate: truncated input")
          total += n
        }
        if (total != rawLen)
          throw new CorruptColumnFileException("deflate: decompressed length mismatch")
        out
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new CorruptColumnFileException(s"deflate: ${e.getMessage}")
      } finally inflater.end()
    case ZSTD =>
      val cur = new Cursor(0)
      val rawLen = Varint.get(data, cur)
      if (rawLen < 0 || rawLen > Int.MaxValue.toLong)
        throw new CorruptColumnFileException("zstd: unreasonable block size")
      val out = new Array[Byte](rawLen.toInt)
      try {
        val n = com.github.luben.zstd.Zstd.decompressByteArray(
          out, 0, out.length, data, cur.pos, data.length - cur.pos)
        if (n != rawLen)
          throw new CorruptColumnFileException("zstd: decompressed length mismatch")
      } catch {
        case e: com.github.luben.zstd.ZstdException =>
          throw new CorruptColumnFileException(s"zstd: ${e.getMessage}")
      }
      out
    case other =>
      throw new CorruptColumnFileException(s"unknown compression scheme: $other")
  }
}
