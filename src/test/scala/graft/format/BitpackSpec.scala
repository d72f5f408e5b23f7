package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Packed-numeric (frame-of-reference + bit-packing) extension:
  * [[PackedIntColumnWriter]] / the `varint 0, varint 0` block sub-marker.
  * Codec-level coverage; the Spark write-option path is covered by
  * graft.spark.BitpackEncodingSpec.
  */
class BitpackSpec extends AnyFunSuite {

  private def le(v: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var k = 0
    while (k < width) { out(k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
    out
  }

  /** Decode one block into (isNull, leValue) cells. */
  private def decodeAll(block: Array[Byte], width: Int): Seq[Option[Long]] = {
    val d = new ColumnDecoder(block)
    val out = Seq.newBuilder[Option[Long]]
    while (d.hasNext) {
      val cell = d.next()
      out += Option(cell).map { c =>
        assert(c.length == width)
        var v = 0L
        var k = 0
        while (k < c.length) { v |= (c(k) & 0xffL) << (8 * k); k += 1 }
        v
      }
    }
    out.result()
  }

  test("packed block round-trips values and nulls exactly (both widths)") {
    for (width <- Seq(4, 8)) {
      val w = new PackedIntColumnWriter(width)
      val vals: Seq[Option[Long]] =
        (0 until 1000).map(i =>
          if (i % 7 == 3) None
          else Some(1000000L + i * 13 % 777)) // narrow range => packs
      vals.foreach {
        case Some(v) => w.put(le(v, width))
        case None    => w.putNull()
      }
      val block = w.finishChunk()
      val d0 = new ColumnDecoder(block)
      assert(d0.isPackedNumeric && d0.packedWidth == width,
        s"width $width block did not pack")
      assert(decodeAll(block, width) == vals)
    }
  }

  test("packing beats plain on distinct narrow-range values; loses to RLE on constants") {
    val width = 8
    // sorted ids: the classic win
    val packed = new PackedIntColumnWriter(width)
    val plain = new ColumnWriter
    (0 until 10000).foreach { i =>
      packed.put(le(5000000000L + i, width))
      plain.put(le(5000000000L + i, width))
    }
    val pb = packed.finishChunk()
    val qb = plain.finishChunk()
    assert(new ColumnDecoder(pb).isPackedNumeric)
    assert(pb.length * 4 < qb.length,
      s"expected >=4x shrink: packed ${pb.length} vs plain ${qb.length}")

    // constant column: RLE is smaller, so the bail-out emits the plain
    // block byte-identically
    val cPacked = new PackedIntColumnWriter(width)
    val cPlain = new ColumnWriter
    (0 until 10000).foreach { _ =>
      cPacked.put(le(42L, width)); cPlain.put(le(42L, width))
    }
    val cp = cPacked.finishChunk()
    assert(java.util.Arrays.equals(cp, cPlain.finishChunk()))
    assert(!new ColumnDecoder(cp).isPackedNumeric)
  }

  test("all-null and empty chunks fall back to plain; unexpected width poisons to plain") {
    val w = new PackedIntColumnWriter(8)
    assert(w.finishChunk().isEmpty) // empty chunk, like ColumnWriter

    (0 until 10).foreach(_ => w.putNull())
    val nullBlock = w.finishChunk()
    assert(!new ColumnDecoder(nullBlock).isPackedNumeric)
    assert(decodeAll(nullBlock, 8) == Seq.fill(10)(None))

    // a cell of the wrong width (framed nested value): plain passthrough
    val p = new PackedIntColumnWriter(8)
    p.put(le(1L, 8)); p.put(Array[Byte](1, 2, 3)); p.put(le(2L, 8))
    val mixed = p.finishChunk()
    assert(!new ColumnDecoder(mixed).isPackedNumeric)
    val d = new ColumnDecoder(mixed)
    assert(d.next().length == 8 && d.next().length == 3 && d.next().length == 8)
  }

  test("property: packed stream == plain stream under random values/nulls/skips") {
    val rnd = new scala.util.Random(20260812L)
    for (_ <- 0 until 200) {
      val width = if (rnd.nextBoolean()) 8 else 4
      val n = 1 + rnd.nextInt(400)
      // mix regimes: tiny range, huge range, negative bit patterns
      val base = rnd.nextLong()
      val spread = 1L << rnd.nextInt(48)
      val cells: Seq[Option[Long]] = (0 until n).map { _ =>
        if (rnd.nextInt(5) == 0) None
        else {
          val raw = base + (rnd.nextLong() % spread)
          Some(if (width == 4) raw & 0xffffffffL else raw)
        }
      }
      val pw = new PackedIntColumnWriter(width)
      cells.foreach {
        case Some(v) => pw.put(le(v, width))
        case None    => pw.putNull()
      }
      val block = pw.finishChunk()
      assert(decodeAll(block, width) == cells)

      // skip behaves identically to the plain decoder
      val skipAt = rnd.nextInt(n + 1)
      val d = new ColumnDecoder(block)
      d.skip(skipAt.toLong)
      val tail = Seq.newBuilder[Option[Long]]
      while (d.hasNext) tail += Option(d.next()).map { c =>
        var v = 0L; var k = 0
        while (k < c.length) { v |= (c(k) & 0xffL) << (8 * k); k += 1 }
        v
      }
      assert(tail.result() == cells.drop(skipAt))
    }
  }

  private def leD(d: Double): Array[Byte] =
    le(java.lang.Double.doubleToRawLongBits(d), 8)

  /** Decode one width-8 block into (isNull, double-bits) cells. */
  private def decodeBits(block: Array[Byte]): Seq[Option[Long]] = decodeAll(block, 8)

  private def packDoubles(cells: Seq[Option[Double]]): Array[Byte] = {
    val w = new PackedIntColumnWriter(8)
    cells.foreach {
      case Some(d) => w.put(leD(d))
      case None    => w.putNull()
    }
    w.finishChunk()
  }

  test("scaled-decimal: 2-decimal prices pick mode 9, shrink >=3x, round-trip exactly") {
    val cells: Seq[Option[Double]] = (0 until 10000).map { i =>
      if (i % 11 == 7) None
      else Some((90000L + (i * 2654435761L % 10400000L)).toDouble / 100.0)
    }
    val block = packDoubles(cells)
    val d = new ColumnDecoder(block)
    assert(d.isPackedNumeric && d.packedWidthCode == 9,
      s"expected scaled-decimal, got code ${d.packedWidthCode}")
    assert(decodeBits(block) ==
      cells.map(_.map(java.lang.Double.doubleToRawLongBits)))
    val plain = new ColumnWriter
    cells.foreach { case Some(v) => plain.put(leD(v)); case None => plain.putNull() }
    val pb = plain.finishChunk()
    assert(block.length * 3 < pb.length,
      s"expected >=3x shrink: scaled ${block.length} vs plain ${pb.length}")
  }

  test("scaled-decimal: mixed-sign decimals and integral doubles qualify") {
    // division, not `* 0.05`: fl(k/20) is the correctly-rounded k/20, so
    // the scaled verify (m.toDouble/100 bit-equal) holds for every cell;
    // multiplying by the inexact 0.05 double can miss correct rounding
    // for some k, and one such cell rejects the whole chunk's scaled
    // candidate (by design — verified losslessness is per cell)
    val cells: Seq[Option[Double]] = (0 until 2000).map { i =>
      if (i % 13 == 5) None else Some((i - 1000).toDouble / 20)
    }
    val block = packDoubles(cells)
    assert(new ColumnDecoder(block).packedWidthCode == 9)
    assert(decodeBits(block) ==
      cells.map(_.map(java.lang.Double.doubleToRawLongBits)))

    // integral doubles qualify for scaled (s=0); an ascending series is
    // also XOR-friendly, so either double mode may win the size race —
    // never raw FOR (sign/exponent spread) and never plain
    val ints: Seq[Option[Double]] = (0 until 2000).map(i => Some((i * 37).toDouble))
    val ib = packDoubles(ints)
    assert(Set(9, 10).contains(new ColumnDecoder(ib).packedWidthCode))
    assert(decodeBits(ib) == ints.map(_.map(java.lang.Double.doubleToRawLongBits)))
  }

  /** Float-precision values stored as double: 29 trailing-zero mantissa
    * bits for the XOR window to trim, mixed signs and magnitudes so raw
    * FOR sees a ~2^63 unsigned spread, and non-decimal values so scaled
    * can't fire — the shape where XOR-delta is the only winner.
    */
  private def floatPrecisionCells(n: Int, nulls: Boolean): Seq[Option[Double]] =
    (0 until n).map { i =>
      if (nulls && i % 19 == 3) None
      else Some((((i * 48271) % 100000 - 50000).toFloat / 7f).toDouble)
    }

  test("xor-delta: float-precision mixed-sign doubles pick mode 10 and shrink") {
    val cells = floatPrecisionCells(8000, nulls = true)
    val block = packDoubles(cells)
    val d = new ColumnDecoder(block)
    assert(d.isPackedNumeric && d.packedWidthCode == 10,
      s"expected xor-delta, got code ${d.packedWidthCode}")
    assert(decodeBits(block) ==
      cells.map(_.map(java.lang.Double.doubleToRawLongBits)))
    val plain = new ColumnWriter
    cells.foreach { case Some(x) => plain.put(leD(x)); case None => plain.putNull() }
    // plain front-coding already exploits the zero low bytes of
    // float-precision doubles (LE shares the low-byte prefix), so the
    // honest bar is a 1.5x win, not the 3x of the scaled-decimal case
    assert(block.length * 3 < plain.finishChunk().length * 2,
      s"expected >=1.5x shrink: xor ${block.length}")
  }

  test("property: double chunks round-trip bit-exactly under every regime") {
    val rnd = new scala.util.Random(20260813L)
    val specials = Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, 0.0, Double.MinPositiveValue,
      java.lang.Double.longBitsToDouble(0x7ff8000000000123L)) // NaN payload
    for (_ <- 0 until 300) {
      val n = 1 + rnd.nextInt(300)
      val regime = rnd.nextInt(5)
      val cells: Seq[Option[Double]] = (0 until n).map { i =>
        if (rnd.nextInt(6) == 0) None
        else Some(regime match {
          case 0 => rnd.nextInt(2000000).toDouble / 100.0 // decimal
          case 1 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // raw bits
          case 2 => 1e9 + i * 0.125 + rnd.nextInt(3) // binary fractions
          case 3 => specials(rnd.nextInt(specials.length))
          case _ => (rnd.nextLong() >> rnd.nextInt(40)).toDouble * math.pow(10, rnd.nextInt(8) - 4)
        })
      }
      val block = packDoubles(cells)
      assert(decodeBits(block) ==
        cells.map(_.map(java.lang.Double.doubleToRawLongBits)),
        s"regime $regime n=$n failed bit-exact round-trip")
      // skip parity with the full decode
      val skipAt = rnd.nextInt(n + 1)
      val d = new ColumnDecoder(block)
      d.skip(skipAt.toLong)
      val tail = Seq.newBuilder[Option[Long]]
      while (d.hasNext) tail += Option(d.next()).map { c =>
        var x = 0L; var k = 0
        while (k < c.length) { x |= (c(k) & 0xffL) << (8 * k); k += 1 }
        x
      }
      assert(tail.result() ==
        cells.drop(skipAt).map(_.map(java.lang.Double.doubleToRawLongBits)))
    }
  }

  test("delta-FOR: sorted ids pick mode 11 and collapse to near-zero bits") {
    for (width <- Seq(4, 8)) {
      val base = if (width == 4) 1000000L else 5000000000L
      val w = new PackedIntColumnWriter(width)
      val cells: Seq[Option[Long]] = (0 until 10000).map { i =>
        if (i % 23 == 9) None else Some(base + i)
      }
      cells.foreach {
        case Some(v) => w.put(le(v, width)); case None => w.putNull()
      }
      val block = w.finishChunk()
      val d = new ColumnDecoder(block)
      assert(d.isPackedNumeric && d.packedWidthCode == 11,
        s"width $width: expected delta-FOR, got code ${d.packedWidthCode}")
      assert(decodeAll(block, width) == cells)
      // nearly-constant step: the zigzag-delta range is tiny (a null
      // gap doubles the step), so the payload is bits, not bytes —
      // far below raw FOR's ~14 bits/value for this range
      assert(block.length < 10000 * 14 / 8 / 4,
        s"width $width delta block unexpectedly large: ${block.length}")
    }
  }

  test("delta-FOR: descending and jittered sequences round-trip and still win") {
    val rnd = new scala.util.Random(20260814L)
    // descending with jitter: zigzag keeps mixed-sign steps small
    val cells: Seq[Option[Long]] = (0 until 8000).map { i =>
      if (i % 31 == 7) None
      else Some(9000000000L - i * 1000L + rnd.nextInt(200) - 100)
    }
    val w = new PackedIntColumnWriter(8)
    cells.foreach {
      case Some(v) => w.put(le(v, 8)); case None => w.putNull()
    }
    val block = w.finishChunk()
    val d = new ColumnDecoder(block)
    assert(d.isPackedNumeric && d.packedWidthCode == 11,
      s"expected delta-FOR, got code ${d.packedWidthCode}")
    assert(decodeAll(block, 8) == cells)
    // range is ~8e6 (23 bits/value for FOR); delta spread is ~2^9
    val plain = new ColumnWriter
    cells.foreach { case Some(v) => plain.put(le(v, 8)); case None => plain.putNull() }
    assert(block.length * 4 < plain.finishChunk().length,
      s"expected >=4x shrink: delta ${block.length}")
  }

  test("delta-FOR: single-value and wrap-adjacent chunks round-trip") {
    // one non-null cell among nulls: no deltas, bw 0
    val w1 = new PackedIntColumnWriter(8)
    w1.putNull(); w1.put(le(123456789L, 8)); w1.putNull()
    val b1 = w1.finishChunk()
    assert(decodeAll(b1, 8) == Seq(None, Some(123456789L), None))
    // unsigned-wrap-adjacent patterns (e.g. -1L then 0L): deltas wrap
    // mod 2^64 and decode adds them back exactly
    val w2 = new PackedIntColumnWriter(8)
    Seq(-1L, 0L, Long.MinValue, Long.MaxValue).foreach(v => w2.put(le(v, 8)))
    val b2 = w2.finishChunk()
    assert(decodeAll(b2, 8) ==
      Seq(Some(-1L), Some(0L), Some(Long.MinValue), Some(Long.MaxValue)))
  }

  test("corrupt delta-FOR headers throw, never mis-decode") {
    // layout: 0,0,11,width,cnt,nc,first(8),zMin(8),bw,payload — craft a
    // no-null sorted block so every prefix byte is a one-byte varint
    val w = new PackedIntColumnWriter(8)
    (0 until 100).foreach(i => w.put(le(7000000L + i * 3, 8)))
    val block = w.finishChunk()
    assert(new ColumnDecoder(block).packedWidthCode == 11)
    assert(block(2) == 11.toByte && block(3) == 8.toByte)
    // bad width varint
    val badW = block.clone(); badW(3) = 5.toByte
    intercept[CorruptColumnFileException](new ColumnDecoder(badW))
    // truncation at every header prefix
    for (cut <- 2 until math.min(block.length, 28))
      intercept[CorruptColumnFileException] {
        val d = new ColumnDecoder(java.util.Arrays.copyOf(block, cut))
        while (d.hasNext) d.next()
      }
    // trailing garbage
    intercept[CorruptColumnFileException] {
      val d = new ColumnDecoder(java.util.Arrays.copyOf(block, block.length + 3))
      while (d.hasNext) d.next()
    }
  }

  test("corrupt double-mode headers throw, never mis-decode") {
    // scale out of range: craft a minimal mode-9 block and bump the
    // scale byte (layout: 0,0,9,cnt,nc,scale,... all one-byte varints)
    val scaled = packDoubles((0 until 100).map(i => Some(i / 10.0)))
    assert(new ColumnDecoder(scaled).packedWidthCode == 9)
    assert(scaled(2) == 9.toByte && scaled(3) == 100.toByte && scaled(4) == 0.toByte)
    val badScale = scaled.clone()
    badScale(5) = 19.toByte
    intercept[CorruptColumnFileException](new ColumnDecoder(badScale))

    // xor trim out of range (layout: 0,0,10,cnt,nc,trim,bw,...)
    val xor = packDoubles(floatPrecisionCells(100, nulls = false))
    assert(new ColumnDecoder(xor).packedWidthCode == 10)
    val badTrim = xor.clone()
    badTrim(5) = 70.toByte
    intercept[CorruptColumnFileException](new ColumnDecoder(badTrim))
    // trim + bw > 64
    val badBw = xor.clone()
    badBw(6) = 80.toByte
    intercept[CorruptColumnFileException](new ColumnDecoder(badBw))

    // truncation at every header prefix of both modes
    for (block <- Seq(scaled, xor); cut <- 2 until math.min(block.length, 24))
      intercept[CorruptColumnFileException] {
        val d = new ColumnDecoder(java.util.Arrays.copyOf(block, cut))
        while (d.hasNext) d.next()
      }
    // trailing garbage
    for (block <- Seq(scaled, xor))
      intercept[CorruptColumnFileException] {
        val d = new ColumnDecoder(java.util.Arrays.copyOf(block, block.length + 3))
        while (d.hasNext) d.next()
      }
  }

  test("corrupt packed headers throw CorruptColumnFileException, never mis-decode") {
    // craft a small valid packed block, then damage it
    def valid(): Array[Byte] = {
      val w = new PackedIntColumnWriter(8)
      (0 until 64).foreach(i =>
        if (i % 5 == 0) w.putNull() else w.put(le(1000L + i, 8)))
      val b = w.finishChunk()
      assert(new ColumnDecoder(b).isPackedNumeric)
      b
    }
    val block = valid()

    def corrupt(mutate: Array[Byte] => Array[Byte]): Unit = {
      val bad = mutate(block.clone())
      intercept[CorruptColumnFileException] {
        val d = new ColumnDecoder(bad)
        while (d.hasNext) d.next()
      }
    }
    // truncations at every prefix of the header region must throw, not
    // return garbage (bitmap, base, and payload sit past byte 2)
    for (cut <- 2 until math.min(block.length, 24))
      corrupt(b => java.util.Arrays.copyOf(b, cut))
    // width byte: only 4 and 8 are valid
    corrupt { b => b(2) = 7.toByte; b }
    // trailing garbage: payload size mismatch
    corrupt(b => java.util.Arrays.copyOf(b, b.length + 3))
  }
}
