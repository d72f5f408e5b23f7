package graft.format

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input classes replayed from the reference AFL corpus ideas
  * (reference: src/columnfile_test.cc:278-303, testdata .col corpus): the reader
  * must raise a clean CorruptColumnFileException, never crash or hang.
  */
class MalformedInputSpec extends AnyFunSuite {
  private def drain(bytes: Array[Byte]): Unit = {
    val r = ColumnFileReader.open(bytes)
    while (!r.end) r.getRow()
  }

  private def valid(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new ColumnFileWriter(bos, Compression.None)
    w.put(0, "hello-world-value".getBytes(UTF_8))
    w.put(0, "hello-world-other".getBytes(UTF_8))
    w.finish()
    bos.toByteArray
  }

  test("bad magic") {
    assertThrows[CorruptColumnFileException](drain("not a columnfile".getBytes(UTF_8)))
  }

  test("truncated magic") {
    assertThrows[CorruptColumnFileException](drain(Array[Byte]('\n', '\t')))
  }

  test("truncated chunk header length") {
    val v = valid()
    assertThrows[CorruptColumnFileException](drain(v.take(6)))
  }

  test("truncated chunk body") {
    val v = valid()
    assertThrows[CorruptColumnFileException](drain(v.take(v.length - 3)))
  }

  test("field count exceeding header capacity is rejected before allocating") {
    // A corrupt header declaring ~500M fields must raise the clean
    // corruption error, NOT attempt a ~4 GB array allocation (the OOM
    // class the AFL corpus exposed flakily under heap pressure): each
    // field needs at least two header bytes, so any count beyond the
    // header's remaining capacity is provably corrupt.
    val header = new ByteBuf()
    Varint.put(header, 0L)           // compression
    Varint.put(header, 500000000L)   // absurd field count, tiny header
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(ColumnFile.Magic)
    val n = header.size
    bos.write(Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte,
      (n >>> 8).toByte, n.toByte))
    bos.write(header.buf, 0, n)
    assertThrows[CorruptColumnFileException](drain(bos.toByteArray))
  }

  test("nonzero reserved varint") {
    // Hand-build a chunk whose value stream has reserved != 0.
    val block = new ByteBuf()
    Varint.put(block, 1L) // repeat
    Varint.put(block, 7L) // reserved — must be zero
    block.addByte(0xff)
    val bytes = rawChunkFile(block.toArray)
    assertThrows[CorruptColumnFileException](drain(bytes))
  }

  test("shared prefix longer than previous value") {
    val block = new ByteBuf()
    Varint.put(block, 1L); Varint.put(block, 0L)
    Varint.put(block, 2L); block.append("ab".getBytes(UTF_8)) // value "ab"
    Varint.put(block, 1L); Varint.put(block, 0L)
    block.addByte(0xc0 | (9 - 2)) // claims 9-byte shared prefix
    Varint.put(block, 1L); block.append("z".getBytes(UTF_8))
    assertThrows[CorruptColumnFileException](drain(rawChunkFile(block.toArray)))
  }

  test("declared value length exceeds block size") {
    val block = new ByteBuf()
    Varint.put(block, 1L); Varint.put(block, 0L)
    Varint.put(block, 1000L) // declared length, no payload
    assertThrows[CorruptColumnFileException](drain(rawChunkFile(block.toArray)))
  }

  test("unknown compression scheme") {
    val block = Array[Byte](1, 0, 0)
    assertThrows[CorruptColumnFileException](
      drain(rawChunkFile(block, compression = 99)))
  }

  test("zero repeat count") {
    val block = new ByteBuf()
    Varint.put(block, 0L); Varint.put(block, 0L); block.addByte(0xff)
    assertThrows[CorruptColumnFileException](drain(rawChunkFile(block.toArray)))
  }

  test("dictionary: zero-entry dictionary") {
    val b = new ByteBuf()
    Varint.put(b, 0L); Varint.put(b, 0L) // marker, dictCount 0
    assertThrows[CorruptColumnFileException](drain(rawChunkFile(b.toArray)))
  }

  test("dictionary: truncated value table") {
    val b = new ByteBuf()
    Varint.put(b, 0L); Varint.put(b, 2L) // marker, 2 entries
    Varint.put(b, 100L); b.addByte('x')  // claims 100 bytes, has 1
    assertThrows[CorruptColumnFileException](drain(rawChunkFile(b.toArray)))
  }

  test("dictionary: id out of range") {
    val b = new ByteBuf()
    Varint.put(b, 0L); Varint.put(b, 1L)     // marker, 1 entry
    Varint.put(b, 3L); b.append("abc".getBytes(UTF_8))
    Varint.put(b, 1L); Varint.put(b, 0L)     // run: repeat 1, reserved 0
    Varint.put(b, 1L); b.addByte(5)          // value = varint id 5: no such entry
    assertThrows[CorruptColumnFileException](drain(rawChunkFile(b.toArray)))
  }

  /** Frame a single raw (uncompressed) column-0 block as a one-chunk file. */
  private def rawChunkFile(block: Array[Byte], compression: Int = 0): Array[Byte] = {
    val header = new ByteBuf()
    Varint.put(header, compression.toLong)
    Varint.put(header, 1L) // field count
    Varint.put(header, 0L) // column index
    Varint.put(header, block.length.toLong)
    val bos = new ByteArrayOutputStream()
    bos.write(ColumnFile.Magic)
    val n = header.size
    bos.write(Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte))
    bos.write(header.buf, 0, n)
    bos.write(block)
    bos.toByteArray
  }
}
