package graft.format

/** Value-stream encoder for one column within one chunk.
  *
  * Encoding per value run (reference spec: src/columnfile.h:28-55, encoder
  * src/columnfile-writer.cc:259-318):
  *   varint repeat-count, varint reserved (must be 0), then either
  *     0xff                      — NULL run
  *     0xc0|(prefixLen-2), varint suffixLen, suffix bytes
  *                               — value sharing `prefixLen` (3..0x42,
  *                                 stored capped at 0x40) leading bytes
  *                                 with the previously emitted value
  *     varint len, bytes         — plain value
  * Consecutive equal values (or NULLs) collapse into one run (RLE); sorted
  * string columns front-code against the previous distinct value.
  */
/** One column's per-chunk cell sink ([[ColumnWriter]] is the standard
  * run encoding; [[DictColumnWriter]] the opt-in dictionary wrapper).
  */
sealed trait ColumnSink {
  def put(v: Array[Byte]): Unit
  def putNull(): Unit
  def pendingSize: Int
  def finishChunk(): Array[Byte]
}

final class ColumnWriter extends ColumnSink {
  private val data = new ByteBuf(256)
  private var value: Array[Byte] = Array.emptyByteArray
  private var valueIsNull = true
  private var repeat = 0L
  private var sharedPrefix = 0

  /** Encoded bytes buffered so far (approximates reference PendingSize). */
  def pendingSize: Int = data.size + value.length

  def put(v: Array[Byte]): Unit = {
    var mismatch = false
    var newSharedPrefix = 0
    if (valueIsNull) {
      mismatch = true
    } else {
      val n = math.min(v.length, value.length)
      var i = 0
      while (i < n && v(i) == value(i)) i += 1
      if (i != v.length || i != value.length) {
        newSharedPrefix = i
        mismatch = true
      }
    }
    if (mismatch) {
      flushRun()
      value = v.clone()
      valueIsNull = false
      sharedPrefix = newSharedPrefix
    }
    repeat += 1
  }

  def putNull(): Unit = {
    if (!valueIsNull) {
      flushRun()
      valueIsNull = true
    }
    repeat += 1
  }

  /** Emit the pending run into the encoded stream. */
  private def flushRun(): Unit = {
    if (repeat == 0) return
    Varint.put(data, repeat)
    Varint.put(data, 0L) // reserved; readers abort on non-zero
    if (valueIsNull) {
      data.addByte(0xff)
    } else {
      var sp = sharedPrefix
      if (sp > 2) {
        // 0x40 cap keeps the control byte below 0xff (the NULL code).
        if (sp > 0x40) sp = 0x40
        data.addByte(0xc0 | (sp - 2))
        Varint.put(data, (value.length - sp).toLong)
        data.append(value, sp, value.length - sp)
      } else {
        Varint.put(data, value.length.toLong)
        data.append(value)
      }
    }
    repeat = 0L
  }

  /** Flush the pending run and return this column's (uncompressed) encoded
    * block, resetting the writer for the next chunk.
    */
  def finishChunk(): Array[Byte] = {
    flushRun()
    val out = data.toArray
    data.reset()
    value = Array.emptyByteArray
    valueIsNull = true
    sharedPrefix = 0
    out
  }
}

object DictColumnWriter {
  /** Above this many distinct values a chunk's dictionary is judged
    * pointless and the block re-encodes plain at finish time.
    */
  val MaxEntries = 1 << 16
}

/** Dictionary-encoding wrapper for low-cardinality (categorical)
  * columns — an EXTENSION to the reference format, gated by the
  * `dictionary` write option (files using it are ours alone; everything
  * else this engine writes stays reference-parseable).
  *
  * Block layout:
  * {{{
  *   varint 0                 // marker: invalid as a repeat count in the
  *                            // standard stream, so plain blocks can
  *                            // never be misread as dictionaries
  *   varint dictCount         // >= 1
  *   dictCount x (varint len, bytes)   // value table, first-seen order
  *   <standard run-encoded stream of varint dictionary ids>
  * }}}
  *
  * The id stream reuses the standard [[ColumnWriter]] run machinery, so
  * RLE still collapses repeated ids and NULL runs are unchanged. The
  * reference's prefix coding only helps SORTED strings; a dictionary
  * covers the unsorted categorical case (flags, langs, sources) — each
  * distinct value is stored once per chunk instead of once per run.
  *
  * `finishChunk` bails out to the plain encoding when the dictionary
  * didn't pay (more than [[DictColumnWriter.MaxEntries]] distinct values,
  * or fewer than 2 cells per distinct value), so enabling the option on
  * a high-cardinality column costs one re-encode pass, never a bigger
  * file.
  */
final class DictColumnWriter extends ColumnSink {
  private val ids = new ColumnWriter
  private val index = scala.collection.mutable.HashMap.empty[scala.collection.immutable.ArraySeq[Byte], Int]
  private val values = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  private val idBytes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
  private var dictByteSize = 0L
  private var cells = 0L

  def put(v: Array[Byte]): Unit = {
    val id = index.get(scala.collection.immutable.ArraySeq.unsafeWrapArray(v)) match {
      case Some(i) => i
      case None =>
        // defensive copy for the stored entry (callers may reuse buffers)
        val copy = v.clone()
        val i = values.size
        index.update(scala.collection.immutable.ArraySeq.unsafeWrapArray(copy), i)
        values += copy
        val b = new ByteBuf(5)
        Varint.put(b, i.toLong)
        idBytes += b.toArray
        dictByteSize += copy.length + 2
        i
    }
    ids.put(idBytes(id))
    cells += 1
  }

  def putNull(): Unit = { ids.putNull(); cells += 1 }

  def pendingSize: Int = (ids.pendingSize + dictByteSize).toInt

  def finishChunk(): Array[Byte] = {
    val idBlock = ids.finishChunk()
    val entries = values.toSeq
    val paysOff = entries.nonEmpty &&
      entries.size <= DictColumnWriter.MaxEntries &&
      entries.size * 2L <= cells
    val out =
      if (entries.isEmpty) idBlock // all-NULL chunk: plain null runs
      else if (paysOff) {
        val buf = new ByteBuf(256)
        Varint.put(buf, 0L)
        Varint.put(buf, entries.size.toLong)
        entries.foreach { v =>
          Varint.put(buf, v.length.toLong)
          buf.append(v)
        }
        buf.append(idBlock)
        buf.toArray
      } else {
        // dictionary defeated: re-encode the id stream as plain values
        val plain = new ColumnWriter
        val dec = new ColumnDecoder(idBlock)
        val c = new Cursor(0)
        while (dec.hasNext) {
          val cell = dec.next()
          if (cell == null) plain.putNull()
          else {
            c.pos = 0
            plain.put(entries(Varint.get(cell, c).toInt))
          }
        }
        plain.finishChunk()
      }
    index.clear(); values.clear(); idBytes.clear()
    dictByteSize = 0; cells = 0
    out
  }
}

/** Value-stream decoder for one column block (already decompressed).
  *
  * Inverse of [[ColumnWriter]] (reference: src/columnfile-reader.cc:471-615).
  * Unlike the reference — which memmoves the shared prefix into its own
  * input buffer — this keeps an explicit previous-value buffer.
  */
final class ColumnDecoder(data: Array[Byte]) {
  private val cur = new Cursor(0)
  private var repeat = 0L
  private var value: Array[Byte] = Array.emptyByteArray
  private var valueIsNull = true

  /** Dictionary extension (see [[DictColumnWriter]]): a block starting
    * with varint 0 — invalid as a repeat count in the standard stream —
    * carries a value table, and the run-encoded stream holds varint ids.
    * null for plain blocks; transparent to every caller of `next`.
    */
  private val dictVals: Array[Array[Byte]] = {
    if (data.length == 0) null
    else {
      val mark = cur.pos
      if (Varint.get(data, cur) != 0L) { cur.pos = mark; null }
      else {
        val n = Varint.get(data, cur)
        if (n <= 0 || n > Int.MaxValue)
          throw new CorruptColumnFileException(s"corrupt dictionary size $n")
        val out = new Array[Array[Byte]](n.toInt)
        var i = 0
        while (i < out.length) {
          val len = Varint.get(data, cur)
          if (len < 0 || cur.pos + len > data.length)
            throw new CorruptColumnFileException("truncated dictionary entry")
          out(i) = java.util.Arrays.copyOfRange(data, cur.pos, cur.pos + len.toInt)
          cur.pos += len.toInt
          i += 1
        }
        out
      }
    }
  }
  // id-lookup cache: an RLE run shares one id-bytes instance
  private var lastIdRef: Array[Byte] = _
  private var lastId = -1

  def hasNext: Boolean = repeat > 0 || cur.pos < data.length

  /** True when this block is dictionary-encoded; [[dictionary]] and
    * [[nextId]] then expose the id-level view (vectorized fast path).
    */
  def isDictEncoded: Boolean = dictVals != null
  def dictionary: Array[Array[Byte]] = dictVals

  private def idOf(b: Array[Byte]): Int = {
    if (b eq lastIdRef) return lastId
    val c = new Cursor(0)
    val id = Varint.get(b, c)
    if (id < 0 || id >= dictVals.length || c.pos != b.length)
      throw new CorruptColumnFileException(s"dictionary id $id out of range")
    lastIdRef = b
    lastId = id.toInt
    lastId
  }

  /** Returns the next cell, or null for a NULL cell. The returned array
    * must not be mutated (RLE runs share one instance).
    */
  def next(): Array[Byte] = {
    if (repeat == 0) fill()
    repeat -= 1
    if (valueIsNull) null
    else if (dictVals == null) value
    else dictVals(idOf(value))
  }

  /** Dictionary id of the next cell (-1 for NULL). Only valid when
    * [[isDictEncoded]].
    */
  def nextId(): Int = {
    if (repeat == 0) fill()
    repeat -= 1
    if (valueIsNull) -1 else idOf(value)
  }

  /** Skip forward `n` cells (used by row-filter survivor fetch).
    *
    * Stops early if the block is exhausted: on a ragged chunk a short
    * column may end before the survivor target, and the remaining cells
    * are NULL by the projection-independent ragged semantics — the
    * callers' `hasNext` guards then read the column as NULL.
    */
  def skip(n: Long): Unit = {
    var remaining = n
    while (remaining > 0 && hasNext) {
      if (repeat == 0) fill()
      val take = math.min(repeat, remaining)
      repeat -= take
      remaining -= take
    }
  }

  private def fill(): Unit = {
    if (cur.pos >= data.length)
      throw new CorruptColumnFileException("read past end of column block")
    repeat = Varint.get(data, cur)
    if (repeat == 0)
      throw new CorruptColumnFileException("corrupt input: zero repeat count")
    val reserved = Varint.get(data, cur)
    if (reserved != 0)
      throw new CorruptColumnFileException(
        "incompatible format: reserved value not zero")
    if (cur.pos >= data.length)
      throw new CorruptColumnFileException("truncated value header")
    val b0 = data(cur.pos) & 0xff
    if ((b0 & 0xc0) == 0xc0) {
      cur.pos += 1
      if (b0 == 0xff) {
        valueIsNull = true
      } else {
        val sharedPrefix = (b0 & 0x3f) + 2
        val suffixLen = Varint.get(data, cur)
        if (sharedPrefix > value.length)
          throw new CorruptColumnFileException(
            "corrupt input: shared prefix longer than previous value")
        if (cur.pos + suffixLen > data.length)
          throw new CorruptColumnFileException("truncated value payload")
        val next = new Array[Byte]((sharedPrefix + suffixLen).toInt)
        System.arraycopy(value, 0, next, 0, sharedPrefix)
        System.arraycopy(data, cur.pos, next, sharedPrefix, suffixLen.toInt)
        cur.pos += suffixLen.toInt
        value = next
        valueIsNull = false
      }
    } else {
      val len = Varint.get(data, cur)
      if (cur.pos + len > data.length)
        throw new CorruptColumnFileException("truncated value payload")
      value = java.util.Arrays.copyOfRange(data, cur.pos, cur.pos + len.toInt)
      cur.pos += len.toInt
      valueIsNull = false
    }
  }
}
