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
final class ColumnWriter {
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

  def hasNext: Boolean = repeat > 0 || cur.pos < data.length

  /** Returns the next cell, or null for a NULL cell. The returned array
    * must not be mutated (RLE runs share one instance).
    */
  def next(): Array[Byte] = {
    if (repeat == 0) fill()
    repeat -= 1
    if (valueIsNull) null else value
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
