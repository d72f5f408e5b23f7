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

object PackedIntColumnWriter {
  /** Powers of ten through 1e18. 10^k is exactly representable as a
    * double for k ≤ 22 (the significand only needs k bits beyond the
    * 2^k factor), so every entry is exact. Built from exact Long powers
    * via the JLS-specified long→double conversion, NOT `math.pow`: pow
    * is only guaranteed to 1 ulp and may differ across JVMs/platforms
    * (intrinsics), and a writer/reader Pow10 divergence would silently
    * decode code-9 blocks to different bit patterns than were verified
    * at encode.
    */
  private[format] val Pow10: Array[Double] = {
    val longs = new Array[Long](19)
    longs(0) = 1L
    for (i <- 1 to 18) longs(i) = longs(i - 1) * 10L
    longs.map(_.toDouble)
  }
  private[format] val MaxScale = 18
  private final val MaxExactInt = (1L << 53).toDouble

  /** The scaled-long view of a double bit pattern at decimal scale `s`:
    * the integer `m` with `m.toDouble / 10^s` bit-identical to the
    * input, or `Long.MinValue` when no such exactly-representable `m`
    * exists (non-decimal value, NaN/Inf, -0.0, |m| beyond the 2^53
    * exact-integer window — `Long.MinValue` can never be a valid `m`
    * because valid ones are bounded by ±2^53).
    */
  private[format] def scaledLong(bits: Long, s: Int): Long = {
    val d = java.lang.Double.longBitsToDouble(bits)
    val scaled = d * Pow10(s)
    // the bounds check is false for NaN too
    if (!(scaled >= -MaxExactInt && scaled <= MaxExactInt)) return Long.MinValue
    val m = Math.round(scaled)
    if (java.lang.Double.doubleToRawLongBits(m.toDouble / Pow10(s)) == bits) m
    else Long.MinValue
  }

  /** Bit-pack `bw`-bit values LSB-first into `out` starting at absolute
    * bit offset `bitOff`.
    */
  def writeBits(out: Array[Byte], bitOff: Long, v: Long, bw: Int): Unit = {
    var got = 0
    var pos = bitOff
    while (got < bw) {
      val byteI = (pos >> 3).toInt
      val bitI = (pos & 7).toInt
      val take = math.min(8 - bitI, bw - got)
      val bits = ((v >>> got) & ((1L << take) - 1)).toInt
      out(byteI) = (out(byteI) | (bits << bitI)).toByte
      got += take
      pos += take
    }
  }

  /** Read `bw` bits LSB-first from absolute bit offset `bitOff`. */
  def readBits(data: Array[Byte], baseByte: Int, bitOff: Long, bw: Int): Long = {
    var v = 0L
    var got = 0
    var pos = bitOff
    while (got < bw) {
      val byteI = baseByte + (pos >> 3).toInt
      val bitI = (pos & 7).toInt
      val take = math.min(8 - bitI, bw - got)
      val bits = ((data(byteI) & 0xff) >>> bitI) & ((1 << take) - 1)
      v |= bits.toLong << got
      got += take
      pos += take
    }
    v
  }
}

/** Frame-of-reference + bit-packing for fixed-width little-endian
  * numeric cells — the second format EXTENSION (gated by the `bitpack`
  * write option; companion to [[DictColumnWriter]]'s `dictionary`). The
  * reference format spends `varint repeat, varint 0, varint len, bytes`
  * per distinct numeric value (~11 bytes for a distinct int64); sorted
  * ids, timestamps, and measure columns — the bulk of analytic bytes —
  * compress to `(max-min)` bits per value instead, the standard
  * Parquet/ORC integer strategy.
  *
  * Block layout:
  * {{{
  *   varint 0            // extension marker (shared with dictionary)
  *   varint 0            // sub-marker: packed-numeric (a dictionary has
  *                       //   its entry count >= 1 here, so the two
  *                       //   extensions can never be confused)
  *   varint width        // 4 or 8: decoded cell byte width (LE)
  *   varint cellCount    // including NULLs
  *   varint nullCount
  *   ceil(cellCount/8) bytes   // null bitmap, bit i set = cell i NULL
  *                             //   (present only when nullCount > 0)
  *   8 bytes LE base           // unsigned minimum of the cells' LE view
  *   varint bitWidth           // 0..64 bits per packed delta
  *   ceil((cellCount-nullCount)*bitWidth/8) bytes  // deltas, LSB-first
  * }}}
  *
  * `finishChunk` builds every applicable encoding and keeps the
  * smallest — columns where run-length collapse beats packing
  * (constants, long runs) stay plain, so enabling the option can never
  * grow a file. Values are treated as unsigned bit patterns, which also
  * covers float/double; for width-8 columns two further candidates
  * close the double gap that raw-pattern FOR cannot (sign/exponent bits
  * sit at the top, so the unsigned range is ~2^62 for any mixed-sign or
  * mixed-magnitude chunk):
  *
  *  - **scaled-decimal** (width code 9): when every non-null cell is
  *    exactly `m / 10^s` for one chunk-wide scale `s ≤ 18` and an
  *    integer `m` within the 2^53 exact-double window — prices,
  *    rates, quantities — the `m`s are frame-of-reference bit-packed.
  *    Losslessness is verified per value at encode (decode recomputes
  *    `m.toDouble / 10^s` and the encoder only picks this mode when
  *    that reproduces the original bit pattern, so -0.0 / NaN / Inf
  *    chunks simply don't qualify).
  *  - **XOR-delta** (width code 10): each non-null pattern is XORed
  *    with the previous one (Gorilla-style, simplified to one
  *    chunk-wide bit window instead of per-value control bits: the
  *    trailing-zero trim and width are computed over the whole chunk).
  *    Wins on slowly-varying series — timestamps, sensor values,
  *    cumulative measures — where consecutive doubles share sign,
  *    exponent, and high mantissa bits.
  *  - **zigzag delta-FOR** (width code 11, both cell widths): the
  *    frame of reference shifts from the VALUE range to the
  *    consecutive-DIFFERENCE range — zigzag-mapped so descending and
  *    mixed steps stay small. Raw FOR spends log2(max-min) bits per
  *    value; on sorted/near-sorted columns (ids, timestamps, offsets —
  *    the natural sort orders of a 100 TB table) that is log2(n·step)
  *    while the delta range is only log2(step spread). The first
  *    non-null value ships raw; a corrupt-block reconstruction is
  *    masked to the cell width so decode can never produce an
  *    out-of-domain 4-byte cell.
  *
  * Layouts share the `varint 0, varint 0, varint widthCode, varint
  * cellCount, varint nullCount, [bitmap]` prefix — except code 11,
  * which carries `varint width` (4 or 8) between the code and the cell
  * count since its code does not imply the cell width. After the
  * prefix, code 9 has `varint scale, 8B LE base, varint bitWidth,
  * deltas`, code 10 has `varint trailingTrim, varint bitWidth,
  * xorDeltas`, and code 11 has `8B LE first, 8B LE zigzagMin, varint
  * bitWidth, zigzagDeltas`.
  */
final class PackedIntColumnWriter(width: Int) extends ColumnSink {
  require(width == 4 || width == 8, s"unsupported packed width $width")

  private val plain = new ColumnWriter
  private var vals = new Array[Long](256) // all cells; 0 at null positions
  private val nulls = new java.util.BitSet()
  private var count = 0
  private var nullCount = 0
  private var poisoned = false // unexpected cell width: plain passthrough

  private def grow(): Unit =
    if (count == vals.length)
      vals = java.util.Arrays.copyOf(vals, vals.length * 2)

  private def leValue(v: Array[Byte]): Long =
    if (width == 8)
      (v(0) & 0xffL) | ((v(1) & 0xffL) << 8) | ((v(2) & 0xffL) << 16) |
        ((v(3) & 0xffL) << 24) | ((v(4) & 0xffL) << 32) |
        ((v(5) & 0xffL) << 40) | ((v(6) & 0xffL) << 48) |
        ((v(7) & 0xffL) << 56)
    else
      (v(0) & 0xffL) | ((v(1) & 0xffL) << 8) | ((v(2) & 0xffL) << 16) |
        ((v(3) & 0xffL) << 24)

  def put(v: Array[Byte]): Unit = {
    plain.put(v)
    grow()
    if (v.length != width) poisoned = true
    else vals(count) = leValue(v)
    count += 1
  }

  def putNull(): Unit = {
    plain.putNull()
    grow()
    nulls.set(count)
    count += 1
    nullCount += 1
  }

  def pendingSize: Int = plain.pendingSize

  def finishChunk(): Array[Byte] = {
    val plainBlock = plain.finishChunk()
    var out = plainBlock
    if (!(poisoned || count == 0 || nullCount == count)) {
      def consider(b: Array[Byte]): Unit =
        if (b != null && b.length < out.length) out = b
      consider(buildFor())
      consider(buildDelta())
      if (width == 8) {
        consider(buildScaled())
        consider(buildXor())
      }
    }
    // reset for the next chunk
    if (vals.length > (1 << 16)) vals = new Array[Long](256)
    nulls.clear()
    count = 0
    nullCount = 0
    poisoned = false
    out
  }

  /** Shared `0, 0, widthCode, [width,] cellCount, nullCount, [bitmap]`
    * prefix; `widthArg` is emitted only for codes (11) whose code does
    * not imply the cell width.
    */
  private def headerBuf(widthCode: Int, payloadCap: Int,
      widthArg: Int = 0): ByteBuf = {
    val buf = new ByteBuf(64 + payloadCap)
    Varint.put(buf, 0L)
    Varint.put(buf, 0L)
    Varint.put(buf, widthCode.toLong)
    if (widthArg > 0) Varint.put(buf, widthArg.toLong)
    Varint.put(buf, count.toLong)
    Varint.put(buf, nullCount.toLong)
    if (nullCount > 0) {
      val bitmap = new Array[Byte]((count + 7) / 8)
      var b = nulls.nextSetBit(0)
      while (b >= 0) {
        bitmap(b >> 3) = (bitmap(b >> 3) | (1 << (b & 7))).toByte
        b = nulls.nextSetBit(b + 1)
      }
      buf.append(bitmap)
    }
    buf
  }

  private def appendLeLong(buf: ByteBuf, v: Long): Unit = {
    val b = new Array[Byte](8)
    var k = 0
    while (k < 8) { b(k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
    buf.append(b)
  }

  /** Frame-of-reference over the raw unsigned bit patterns (codes 4/8). */
  private def buildFor(): Array[Byte] = {
    // unsigned min/max over the non-null cells
    var mn = -1L // unsigned max
    var mx = 0L
    var i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        val v = vals(i)
        if (java.lang.Long.compareUnsigned(v, mn) < 0) mn = v
        if (java.lang.Long.compareUnsigned(v, mx) > 0) mx = v
      }
      i += 1
    }
    val range = mx - mn
    val bw =
      if (range == 0L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(range)
    val packedBytes = (((count - nullCount).toLong * bw) + 7) / 8
    val buf = headerBuf(width, packedBytes.toInt)
    appendLeLong(buf, mn)
    Varint.put(buf, bw.toLong)
    val packed = new Array[Byte](packedBytes.toInt)
    var bitOff = 0L
    i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        PackedIntColumnWriter.writeBits(packed, bitOff, vals(i) - mn, bw)
        bitOff += bw
      }
      i += 1
    }
    buf.append(packed)
    buf.toArray
  }

  /** Scaled-decimal (code 9), or null when the chunk doesn't qualify. */
  private def buildScaled(): Array[Byte] = {
    import PackedIntColumnWriter.{scaledLong, MaxScale}
    // greedy pass: grow the chunk scale until every value seen so far
    // qualifies. A value exact at scale s stays exact at s' > s while
    // its scaled form stays inside the 2^53 window (same real quotient,
    // same correctly-rounded double), so one forward scan settles s —
    // except when a large value's 10^(s'-s)-multiplied m leaves the
    // window, which the verification pass below catches.
    var s = 0
    var i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        while (s <= MaxScale && scaledLong(vals(i), s) == Long.MinValue) s += 1
        if (s > MaxScale) return null
      }
      i += 1
    }
    // verify ALL values at the settled scale and collect the m-integers
    val ms = new Array[Long](count)
    var mn = Long.MaxValue
    var mx = Long.MinValue
    i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        val m = scaledLong(vals(i), s)
        if (m == Long.MinValue) return null
        ms(i) = m
        if (m < mn) mn = m
        if (m > mx) mx = m
      }
      i += 1
    }
    val range = mx - mn // both within ±2^53, so the range fits easily
    val bw =
      if (range == 0L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(range)
    val packedBytes = (((count - nullCount).toLong * bw) + 7) / 8
    val buf = headerBuf(9, packedBytes.toInt)
    Varint.put(buf, s.toLong)
    appendLeLong(buf, mn)
    Varint.put(buf, bw.toLong)
    val packed = new Array[Byte](packedBytes.toInt)
    var bitOff = 0L
    i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        PackedIntColumnWriter.writeBits(packed, bitOff, ms(i) - mn, bw)
        bitOff += bw
      }
      i += 1
    }
    buf.append(packed)
    buf.toArray
  }

  /** Chunk-windowed XOR-delta (code 10). Always well-formed; the size
    * comparison decides whether it ships.
    */
  private def buildXor(): Array[Byte] = {
    var orAll = 0L
    var prev = 0L
    var i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        orAll |= vals(i) ^ prev
        prev = vals(i)
      }
      i += 1
    }
    val trim = if (orAll == 0L) 0 else java.lang.Long.numberOfTrailingZeros(orAll)
    val bw =
      if (orAll == 0L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(orAll) - trim
    val packedBytes = (((count - nullCount).toLong * bw) + 7) / 8
    val buf = headerBuf(10, packedBytes.toInt)
    Varint.put(buf, trim.toLong)
    Varint.put(buf, bw.toLong)
    val packed = new Array[Byte](packedBytes.toInt)
    var bitOff = 0L
    prev = 0L
    i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        if (bw > 0) {
          PackedIntColumnWriter.writeBits(packed, bitOff, (vals(i) ^ prev) >>> trim, bw)
          bitOff += bw
        }
        prev = vals(i)
      }
      i += 1
    }
    buf.append(packed)
    buf.toArray
  }

  /** Zigzag delta-FOR (code 11). Always well-formed for any value
    * sequence (differences wrap mod 2^64; decode adds them back, so
    * the round trip is exact either way); the size comparison decides
    * whether it ships.
    */
  private def buildDelta(): Array[Byte] = {
    val nonNull = count - nullCount
    // pass 1: zigzag deltas of consecutive non-null cells; unsigned
    // min/max over them frames the packing window
    val zs = new Array[Long](count) // z at delta positions only
    var first = 0L
    var prev = 0L
    var seen = false
    var mn = -1L // unsigned max
    var mx = 0L
    var i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        val v = vals(i)
        if (!seen) { first = v; seen = true }
        else {
          val d = v - prev
          val z = (d << 1) ^ (d >> 63)
          zs(i) = z
          if (java.lang.Long.compareUnsigned(z, mn) < 0) mn = z
          if (java.lang.Long.compareUnsigned(z, mx) > 0) mx = z
        }
        prev = v
      }
      i += 1
    }
    if (nonNull <= 1) { mn = 0L; mx = 0L }
    val range = mx - mn
    val bw =
      if (range == 0L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(range)
    val deltaCount = math.max(0, nonNull - 1)
    val packedBytes = ((deltaCount.toLong * bw) + 7) / 8
    val buf = headerBuf(11, packedBytes.toInt, widthArg = width)
    appendLeLong(buf, first)
    appendLeLong(buf, mn)
    Varint.put(buf, bw.toLong)
    val packed = new Array[Byte](packedBytes.toInt)
    var bitOff = 0L
    seen = false
    i = 0
    while (i < count) {
      if (!nulls.get(i)) {
        if (!seen) seen = true
        else if (bw > 0) {
          PackedIntColumnWriter.writeBits(packed, bitOff, zs(i) - mn, bw)
          bitOff += bw
        }
      }
      i += 1
    }
    buf.append(packed)
    buf.toArray
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

  /** Extension detection: a block starting with varint 0 — invalid as a
    * repeat count in the standard stream — is either a dictionary block
    * (next varint = entry count >= 1, see [[DictColumnWriter]]) or a
    * packed-numeric block (next varint = 0, see
    * [[PackedIntColumnWriter]]). Plain blocks leave all extension state
    * null; both extensions stay transparent to every caller of `next`.
    */
  private var dictVals: Array[Array[Byte]] = null
  // packed-numeric state: every cell materialized as its unsigned
  // little-endian integer view (0 at NULL positions)
  private var pVals: Array[Long] = null
  private var pNulls: java.util.BitSet = null
  private var pWidth = 0
  private var pWidthCode = 0
  private var pCount = 0
  private var pIdx = 0
  private var pVal = 0L

  if (data.length > 0) {
    val mark = cur.pos
    if (Varint.get(data, cur) != 0L) cur.pos = mark
    else {
      val n = Varint.get(data, cur)
      if (n < 0 || n > Int.MaxValue)
        throw new CorruptColumnFileException(s"corrupt dictionary size $n")
      if (n == 0L) parsePacked()
      else {
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
        dictVals = out
      }
    }
  }

  private def parsePacked(): Unit = {
    val widthCode = Varint.get(data, cur)
    // 4/8: raw frame-of-reference; 9: scaled-decimal double; 10:
    // XOR-delta double; 11: zigzag delta-FOR with an explicit width
    // varint (see PackedIntColumnWriter). 9 and 10 decode to 8-byte
    // double bit patterns.
    val width: Long = widthCode match {
      case 4L | 8L       => widthCode
      case 9L | 10L      => 8L
      case 11L =>
        val w = Varint.get(data, cur)
        if (w != 4L && w != 8L)
          throw new CorruptColumnFileException(s"corrupt packed delta width $w")
        w
      case w =>
        throw new CorruptColumnFileException(s"unsupported packed width $w")
    }
    val cnt = Varint.get(data, cur)
    // 8*len+64 bounds every well-formed count for codes 4/8/9/10 (bitmap
    // or payload bits must cover the cells — a 0-bit-width chunk there
    // means a constant column, which always loses the size race to the
    // plain RLE block and never ships); it exists to stop a crafted
    // zero-payload header from demanding an arbitrary allocation. Code
    // 11 legitimately ships arbitrarily many cells in a ~30-byte block
    // (constant-STEP sequences pack to bitWidth 0 — the flagship
    // sorted-id win), so its count is bounded by a fixed 2^24 ceiling
    // instead: comfortably above any real chunk's cell count (the
    // writer flushes chunks by plain-encoded size long before 16M
    // distinct cells) while capping a crafted block's allocation at
    // pVals' 128 MiB. The Int.MaxValue clamp keeps cnt.toInt from
    // wrapping negative on blocks >= 256 MiB (NegativeArraySizeException
    // would violate the corruption contract).
    val cellCap =
      if (widthCode == 11L)
        math.max(8L * data.length + 64, 1L << 24)
      else 8L * data.length + 64
    if (cnt < 0 || cnt > math.min(cellCap, Int.MaxValue.toLong - 8))
      throw new CorruptColumnFileException(s"corrupt packed cell count $cnt")
    val nc = Varint.get(data, cur)
    if (nc < 0 || nc > cnt)
      throw new CorruptColumnFileException(s"corrupt packed null count $nc")
    val nulls = new java.util.BitSet()
    if (nc > 0) {
      val bytes = ((cnt + 7) / 8).toInt
      if (cur.pos + bytes > data.length)
        throw new CorruptColumnFileException("truncated packed null bitmap")
      var i = 0
      while (i < cnt) {
        if ((data(cur.pos + (i >> 3)) & (1 << (i & 7))) != 0) nulls.set(i)
        i += 1
      }
      // trailing pad bits of the last bitmap byte must be clear
      var pad = cnt.toInt
      while (pad < bytes * 8) {
        if ((data(cur.pos + (pad >> 3)) & (1 << (pad & 7))) != 0)
          throw new CorruptColumnFileException("corrupt packed null bitmap pad")
        pad += 1
      }
      if (nulls.cardinality() != nc)
        throw new CorruptColumnFileException("packed null bitmap/count mismatch")
      cur.pos += bytes
    }
    val vals = new Array[Long](cnt.toInt)
    widthCode match {
      case 4L | 8L =>
        val base = readLeLong("truncated packed base")
        val bw = readBitWidth(0)
        checkPayload(cnt - nc, bw)
        var bitOff = 0L
        var i = 0
        while (i < vals.length) {
          if (!nulls.get(i)) {
            vals(i) =
              if (bw == 0L) base
              else base + PackedIntColumnWriter.readBits(data, cur.pos, bitOff, bw.toInt)
            bitOff += bw
          }
          i += 1
        }
      case 9L =>
        val scale = Varint.get(data, cur)
        if (scale < 0 || scale > PackedIntColumnWriter.MaxScale)
          throw new CorruptColumnFileException(s"corrupt packed scale $scale")
        val base = readLeLong("truncated packed base")
        val bw = readBitWidth(0)
        checkPayload(cnt - nc, bw)
        val p = PackedIntColumnWriter.Pow10(scale.toInt)
        var bitOff = 0L
        var i = 0
        while (i < vals.length) {
          if (!nulls.get(i)) {
            val m =
              if (bw == 0L) base
              else base + PackedIntColumnWriter.readBits(data, cur.pos, bitOff, bw.toInt)
            // the encoder verified this division reproduces the source
            // bit pattern for every cell it packed
            vals(i) = java.lang.Double.doubleToRawLongBits(m.toDouble / p)
            bitOff += bw
          }
          i += 1
        }
      case 11L =>
        val first = readLeLong("truncated packed first value")
        val zMin = readLeLong("truncated packed delta base")
        val bw = readBitWidth(0)
        checkPayload(math.max(0L, cnt - nc - 1), bw)
        val mask = if (width == 4L) 0xffffffffL else -1L
        var prev = 0L
        var seen = false
        var bitOff = 0L
        var i = 0
        while (i < vals.length) {
          if (!nulls.get(i)) {
            if (!seen) { prev = first; seen = true }
            else {
              val z =
                if (bw == 0L) zMin
                else zMin + PackedIntColumnWriter.readBits(data, cur.pos, bitOff, bw.toInt)
              bitOff += bw
              prev += (z >>> 1) ^ -(z & 1L)
            }
            // mask keeps a corrupt 4-byte block inside the cell domain;
            // well-formed blocks never wrap (deltas are exact)
            vals(i) = prev & mask
          }
          i += 1
        }
      case _ => // 10L
        val trim = Varint.get(data, cur)
        if (trim < 0 || trim > 63)
          throw new CorruptColumnFileException(s"corrupt packed xor trim $trim")
        val bw = readBitWidth(trim)
        checkPayload(cnt - nc, bw)
        var prev = 0L
        var bitOff = 0L
        var i = 0
        while (i < vals.length) {
          if (!nulls.get(i)) {
            val x =
              if (bw == 0L) 0L
              else PackedIntColumnWriter.readBits(data, cur.pos, bitOff, bw.toInt) << trim
            prev ^= x
            vals(i) = prev
            bitOff += bw
          }
          i += 1
        }
    }
    cur.pos = data.length
    pVals = vals
    pNulls = nulls
    pWidth = width.toInt
    pCount = cnt.toInt
    pWidthCode = widthCode.toInt
  }

  private def readLeLong(truncMsg: String): Long = {
    if (cur.pos + 8 > data.length)
      throw new CorruptColumnFileException(truncMsg)
    var v = 0L
    var k = 0
    while (k < 8) {
      v |= (data(cur.pos + k) & 0xffL) << (8 * k)
      k += 1
    }
    cur.pos += 8
    v
  }

  private def readBitWidth(trim: Long): Long = {
    val bw = Varint.get(data, cur)
    if (bw < 0 || bw + trim > 64)
      throw new CorruptColumnFileException(s"corrupt packed bit width $bw")
    bw
  }

  /** The packed payload must fill the block exactly. */
  private def checkPayload(nonNull: Long, bw: Long): Unit = {
    val packedBytes = ((nonNull * bw) + 7) / 8
    if (cur.pos + packedBytes != data.length)
      throw new CorruptColumnFileException("packed payload size mismatch")
  }
  // id-lookup cache: an RLE run shares one id-bytes instance
  private var lastIdRef: Array[Byte] = _
  private var lastId = -1

  def hasNext: Boolean =
    if (pVals != null) pIdx < pCount
    else repeat > 0 || cur.pos < data.length

  /** True when this block is dictionary-encoded; [[dictionary]] and
    * [[nextId]] then expose the id-level view (vectorized fast path).
    */
  def isDictEncoded: Boolean = dictVals != null
  def dictionary: Array[Array[Byte]] = dictVals

  /** True when this block is packed-numeric ([[PackedIntColumnWriter]]);
    * [[nextPacked]]/[[packedValue]] then expose the unboxed view
    * (vectorized fast path — no per-cell byte arrays).
    */
  def isPackedNumeric: Boolean = pVals != null
  def packedWidth: Int = pWidth

  /** The block's width code: 4/8 raw FOR, 9 scaled-decimal double, 10
    * XOR-delta double, 11 zigzag delta-FOR; 0 when not packed.
    * Diagnostic (tests, tools) — decode behavior is identical across
    * codes.
    */
  def packedWidthCode: Int = pWidthCode

  /** Advance one packed cell; true when it is non-NULL, with its
    * little-endian unsigned integer view left in [[packedValue]]. Only
    * valid when [[isPackedNumeric]].
    */
  def nextPacked(): Boolean = {
    if (pIdx >= pCount)
      throw new CorruptColumnFileException("read past end of column block")
    val isNull = pNulls.get(pIdx)
    pVal = pVals(pIdx)
    pIdx += 1
    !isNull
  }
  def packedValue: Long = pVal

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
    if (pVals != null) {
      if (!nextPacked()) return null
      val out = new Array[Byte](pWidth)
      var k = 0
      while (k < pWidth) {
        out(k) = ((pVal >>> (8 * k)) & 0xff).toByte
        k += 1
      }
      return out
    }
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
    if (pVals != null) {
      pIdx = math.min(pCount.toLong, pIdx + n).toInt
      return
    }
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
