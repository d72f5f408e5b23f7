package graft.format

import java.io.{InputStream, OutputStream}
import scala.collection.mutable

/** Chunked columnar file writer.
  *
  * Layout (reference: src/columnfile.h "Chunk encoding",
  * src/columnfile-writer.cc:44-80): 4-byte magic `\n\t"\0`, then chunks.
  * Each chunk = 4-byte big-endian header length, varint compression,
  * varint field count, per-field (varint columnIndex, varint byteSize)
  * pairs, then the concatenated compressed column blocks. Chunks are the
  * atomic split unit — prefix decoding is stateful within a chunk, so
  * readers parallelize per chunk, never by byte range.
  */
object ColumnFile {
  val Magic: Array[Byte] = Array('\n'.toByte, '\t'.toByte, '"'.toByte, 0.toByte)

  /** Per-chunk metadata discovered by walking headers. `dataOffset` points
    * at the first column block; `fields` are (columnIndex, byteSize) in
    * file order.
    */
  final case class ChunkInfo(
      headerOffset: Long,
      dataOffset: Long,
      compression: Int,
      fields: Array[(Int, Long)]) {
    def dataSize: Long = fields.iterator.map(_._2).sum
    def endOffset: Long = dataOffset + dataSize
  }
}

final class ColumnFileWriter(
    out: OutputStream,
    private var compression: Int = Compression.Default,
    writeMagic: Boolean = true) {
  import ColumnFile._

  private val fields = mutable.SortedMap.empty[Int, ColumnSink]
  private var finished = false
  private var written: Long = if (writeMagic) Magic.length.toLong else 0L
  private val chunkRangesBuf = mutable.ArrayBuffer.empty[(Long, Long)]
  private var dictColumns: Set[Int] = Set.empty
  private var packedColumns: Map[Int, Int] = Map.empty
  if (writeMagic) out.write(Magic)

  def setCompression(codec: Int): Unit = compression = codec

  /** Columns to dictionary-encode ([[DictColumnWriter]] — a format
    * extension; see its scaladoc). Call before the first put.
    */
  def setDictionaryColumns(cols: Set[Int]): Unit = dictColumns = cols

  /** Columns to frame-of-reference bit-pack ([[PackedIntColumnWriter]] —
    * a format extension; see its scaladoc), mapping column index to its
    * fixed little-endian cell width (4 or 8). Call before the first put.
    * Disjoint from the dictionary set by construction (dictionary covers
    * string/binary, packing covers fixed-width numerics).
    */
  def setPackedColumns(cols: Map[Int, Int]): Unit = packedColumns = cols

  /** (headerOffset, dataSize) of every chunk emitted so far. Offsets are
    * stream-relative — absolute file offsets when this writer wrote the
    * magic. Lets the commit path persist chunk locations in the stats
    * sidecar so planners never need to walk headers.
    */
  def chunkRanges: Seq[(Long, Long)] = chunkRangesBuf.toSeq

  /** Total bytes emitted (== final file length after finish()). */
  def bytesWritten: Long = written

  private def field(col: Int): ColumnSink =
    fields.getOrElseUpdate(col,
      if (dictColumns(col)) new DictColumnWriter
      else packedColumns.get(col) match {
        case Some(w) => new PackedIntColumnWriter(w)
        case None    => new ColumnWriter
      })

  def put(col: Int, value: Array[Byte]): Unit = field(col).put(value)
  def putNull(col: Int): Unit = field(col).putNull()

  /** Write one (possibly ragged) row: sorted (columnIndex, value|null). */
  def putRow(row: Iterable[(Int, Option[Array[Byte]])]): Unit =
    row.foreach {
      case (c, Some(v)) => put(c, v)
      case (c, None)    => putNull(c)
    }

  /** Approximate buffered encoded bytes; callers flush when this crosses a
    * target chunk size (16 MiB in the reference cat tool, 128 MiB in sort).
    */
  def pendingSize: Long = fields.valuesIterator.map(_.pendingSize.toLong).sum

  /** Emit all buffered values as one chunk. No-op when nothing is buffered. */
  def flush(): Unit = {
    if (fields.isEmpty) return
    // The expensive codecs compress column blocks in parallel (reference:
    // multi-threaded zlib deflate, src/zlib-parallel.cc:37-145, and the
    // column-parallel LZMA decode it mirrors); cheap codecs stay
    // sequential — Spark task parallelism already covers them.
    val encodedBlocks = fields.toSeq.map { case (col, w) => (col, w.finishChunk()) }
    val parallelCodec =
      compression == Compression.ZLIB || compression == Compression.LZMA
    val blocks: Seq[(Int, Array[Byte])] =
      if (parallelCodec && encodedBlocks.length > 1) {
        import scala.jdk.CollectionConverters._
        encodedBlocks.asJava.parallelStream()
          .map[(Int, Array[Byte])] { case (col, encoded) =>
            (col, Compression.compress(compression, encoded, 0, encoded.length))
          }
          .collect(java.util.stream.Collectors.toList[(Int, Array[Byte])])
          .asScala.toSeq
      } else encodedBlocks.map { case (col, encoded) =>
        (col, Compression.compress(compression, encoded, 0, encoded.length))
      }
    val header = new ByteBuf(64)
    Varint.put(header, compression.toLong)
    Varint.put(header, blocks.size.toLong)
    blocks.foreach { case (col, block) =>
      Varint.put(header, col.toLong)
      Varint.put(header, block.length.toLong)
    }
    val n = header.size
    out.write(Array[Byte](
      (n >>> 24).toByte, (n >>> 16).toByte, (n >>> 8).toByte, n.toByte))
    out.write(header.buf, 0, n)
    blocks.foreach { case (_, block) => out.write(block) }
    val dataSize = blocks.iterator.map(_._2.length.toLong).sum
    chunkRangesBuf += ((written, dataSize))
    written += 4L + n + dataSize
    fields.clear()
  }

  def finish(): Unit = if (!finished) {
    flush()
    out.flush()
    finished = true
  }

  def close(): Unit = { finish(); out.close() }
}

/** Random-access input abstraction: local byte arrays for tests, Hadoop
  * streams for Spark (reference analog: ColumnFileInput SPI,
  * src/columnfile.h:154-208).
  */
trait SeekableInput extends AutoCloseable {
  def size: Long
  def readFully(offset: Long, length: Int): Array[Byte]
  override def close(): Unit = ()
}

final class BytesInput(bytes: Array[Byte]) extends SeekableInput {
  def size: Long = bytes.length.toLong
  def readFully(offset: Long, length: Int): Array[Byte] = {
    if (offset + length > bytes.length)
      throw new CorruptColumnFileException("short read")
    java.util.Arrays.copyOfRange(bytes, offset.toInt, offset.toInt + length)
  }
}

object ColumnFileReader {
  import ColumnFile._

  /** Validate the magic and walk all chunk headers without touching column
    * data. Cheap (headers are tiny); Spark runs this once on the driver for
    * partition planning.
    */
  def scanChunks(in: SeekableInput): Seq[ChunkInfo] = {
    val total = in.size
    if (total < Magic.length.toLong ||
        !java.util.Arrays.equals(in.readFully(0, Magic.length), Magic))
      throw new CorruptColumnFileException("bad or missing magic bytes")
    val chunks = Seq.newBuilder[ChunkInfo]
    var off = Magic.length.toLong
    while (off < total) {
      val info = readChunkHeader(in, off, total)
      chunks += info
      off = info.endOffset
    }
    chunks.result()
  }

  def readChunkHeader(in: SeekableInput, offset: Long, total: Long): ChunkInfo = {
    if (offset + 4 > total)
      throw new CorruptColumnFileException("truncated chunk header length")
    val lenBytes = in.readFully(offset, 4)
    val headerLen = ((lenBytes(0) & 0xff) << 24) | ((lenBytes(1) & 0xff) << 16) |
      ((lenBytes(2) & 0xff) << 8) | (lenBytes(3) & 0xff)
    if (headerLen < 0 || offset + 4 + headerLen > total)
      throw new CorruptColumnFileException("truncated chunk header")
    val header = in.readFully(offset + 4, headerLen)
    val cur = new Cursor(0)
    val compression = Varint.get(header, cur)
    val fieldCount = Varint.get(header, cur)
    // bound by what the header could possibly encode (each field is two
    // varints >= 1 byte each) BEFORE allocating: a corrupt header
    // declaring e.g. 500M fields would otherwise allocate gigabytes and
    // OOM the task instead of raising the clean corruption error
    // (fuzz-corpus-found — the declared count is attacker-controlled)
    if (fieldCount < 0 || fieldCount > (header.length - cur.pos) / 2)
      throw new CorruptColumnFileException("field count exceeds header capacity")
    val fields = new Array[(Int, Long)](fieldCount.toInt)
    var i = 0
    while (i < fieldCount) {
      val col = Varint.get(header, cur)
      val size = Varint.get(header, cur)
      fields(i) = (col.toInt, size)
      i += 1
    }
    val info = ChunkInfo(offset, offset + 4 + headerLen, compression.toInt, fields)
    if (info.endOffset > total)
      throw new CorruptColumnFileException("chunk data extends past end of file")
    info
  }

  /** Decode the selected columns of one chunk into per-column decoders.
    * Unselected column blocks are never read (projection pushdown,
    * reference: src/columnfile-reader.cc:148-198). `columns == null`
    * selects everything.
    */
  def openChunk(
      in: SeekableInput,
      chunk: ChunkInfo,
      columns: java.util.Set[Integer]): mutable.LinkedHashMap[Int, ColumnDecoder] = {
    // Sequential ranged reads (skip unselected blocks), then decompress.
    val blocks = mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var off = chunk.dataOffset
    chunk.fields.foreach { case (col, size) =>
      if (columns == null || columns.contains(Integer.valueOf(col))) {
        if (size > Int.MaxValue)
          throw new CorruptColumnFileException("unreasonable column block size")
        blocks += ((col, in.readFully(off, size.toInt)))
      }
      off += size
    }
    // LZMA is slow enough that the reference decompresses columns in
    // parallel (src/columnfile-reader.cc:626-643, std::async per
    // column); mirror that for multi-column LZMA chunks. The cheap
    // codecs stay sequential — task-level parallelism already covers
    // them, and thread handoff would cost more than it saves.
    val decoded: Seq[(Int, Array[Byte])] =
      if (chunk.compression == Compression.LZMA && blocks.length > 1) {
        import scala.jdk.CollectionConverters._
        blocks.asJava.parallelStream()
          .map[(Int, Array[Byte])] { case (col, block) =>
            (col, Compression.decompress(chunk.compression, block))
          }
          .collect(java.util.stream.Collectors.toList[(Int, Array[Byte])])
          .asScala.toSeq
      } else {
        blocks.toSeq.map { case (col, block) =>
          (col, Compression.decompress(chunk.compression, block))
        }
      }
    val decoders = mutable.LinkedHashMap.empty[Int, ColumnDecoder]
    decoded.foreach { case (col, bytes) => decoders(col) = new ColumnDecoder(bytes) }
    decoders
  }

  /** EXACT row count of a chunk: the max value count across all its
    * columns (ragged chunks have unequal column lengths, and row
    * assembly zips until every column is exhausted — reference
    * src/columnfile-reader.cc:416-445). Costs one decode walk per
    * column block; used only when a scan needs the count but decoded no
    * data column — empty projections and ragged filter recovery.
    */
  def countRows(in: SeekableInput, chunk: ChunkInfo): Int = {
    var max = 0
    openChunk(in, chunk, null).valuesIterator.foreach { d =>
      var c = 0
      while (d.hasNext) { d.next(); c += 1 }
      if (c > max) max = c
    }
    max
  }

  def open(bytes: Array[Byte]): ColumnFileReader =
    new ColumnFileReader(new BytesInput(bytes))

  def open(in: InputStream): ColumnFileReader = {
    val bytes = in.readAllBytes()
    new ColumnFileReader(new BytesInput(bytes))
  }
}

/** Row-oriented reader over a whole file: iterates chunks, reassembling
  * rows by zipping whichever columns exist in each chunk (reference:
  * src/columnfile-reader.cc:416-445 — absent columns read as NULL).
  */
final class ColumnFileReader(in: SeekableInput) extends AutoCloseable {
  import ColumnFile._

  private val chunks: Seq[ChunkInfo] = ColumnFileReader.scanChunks(in)
  private var chunkIdx = 0
  private var decoders: mutable.LinkedHashMap[Int, ColumnDecoder] = _
  private var columnFilter: java.util.Set[Integer] = null

  def setColumnFilter(columns: Iterable[Int]): Unit = {
    val s = new java.util.HashSet[Integer]()
    columns.foreach(c => s.add(Integer.valueOf(c)))
    columnFilter = s
  }

  def chunkInfos: Seq[ChunkInfo] = chunks

  // Per-column buffered values: a `peek` decodes the column's next value
  // without logically consuming it; `get` consumes. Columns keep
  // INDEPENDENT cursors within a chunk, mirroring the reference's
  // column-granular Peek/Get (columnfile.h:245-251) — a caller reading
  // only column 3 never pays to decode the other columns' values beyond
  // the block decompression.
  private val pending = mutable.TreeMap.empty[Int, Option[Array[Byte]]]

  private def chunkLive: Boolean =
    decoders != null &&
      (pending.nonEmpty || decoders.valuesIterator.exists(_.hasNext))

  private def advance(): Boolean = {
    while (!chunkLive) {
      if (chunkIdx >= chunks.length) return false
      decoders = ColumnFileReader.openChunk(in, chunks(chunkIdx), columnFilter)
      pending.clear()
      chunkIdx += 1
    }
    true
  }

  def end: Boolean = !advance()

  /** True when the current segment (chunk) has no rows left — the next
    * row, if any, starts a new segment (reference: EndOfSegment,
    * columnfile.h:242-243).
    */
  def endOfSegment: Boolean = !chunkLive

  private def readRow(): Seq[(Int, Option[Array[Byte]])] = {
    if (!advance())
      throw new CorruptColumnFileException("read past end of file")
    val row = decoders.iterator.flatMap { case (col, d) =>
      pending.remove(col) match {
        case Some(v)           => Iterator.single((col, v))
        case None if d.hasNext => Iterator.single((col, Option(d.next())))
        case None              => Iterator.empty
      }
    }.toSeq.sortBy(_._1)
    row
  }

  /** Next row as sorted (columnIndex, value|null) pairs; picks up each
    * column at its current cursor (reference: GetRow,
    * columnfile.h:252).
    */
  def getRow(): Seq[(Int, Option[Array[Byte]])] = readRow()

  /** Look at the next row without consuming it. */
  def peekRow(): Seq[(Int, Option[Array[Byte]])] = {
    if (!advance())
      throw new CorruptColumnFileException("peek past end of file")
    decoders.keysIterator.foreach(c => { peek(c); () })
    pending.toSeq
  }

  /** Current value of one column WITHOUT advancing its cursor
    * (reference: Peek, columnfile.h:245-246). None = NULL or column
    * absent from the current chunk.
    */
  def peek(column: Int): Option[Array[Byte]] = {
    if (!advance()) return None
    pending.get(column) match {
      case Some(v) => v
      case None =>
        decoders.get(column).filter(_.hasNext) match {
          case Some(d) =>
            val ov = Option(d.next())
            pending(column) = ov
            ov
          case None => None // absent/exhausted in this chunk => NULL
        }
    }
  }

  /** Current value of one column, advancing ONLY that column's cursor
    * (reference: Get, columnfile.h:248-251). Other columns are not
    * decoded or consumed.
    */
  def get(column: Int): Option[Array[Byte]] = {
    val v = peek(column)
    pending.remove(column)
    v
  }

  def seekToStart(): Unit = { chunkIdx = 0; decoders = null; pending.clear() }

  /** Rewind to the start of the current segment and re-decode it
    * (reference: SeekToStartOfSegment, columnfile.h:263-267 — used by
    * the select path to make multiple per-column passes over one chunk).
    */
  def seekToStartOfSegment(): Unit = {
    pending.clear()
    if (chunkIdx > 0) {
      decoders = ColumnFileReader.openChunk(in, chunks(chunkIdx - 1), columnFilter)
    }
  }

  override def close(): Unit = in.close()
}
