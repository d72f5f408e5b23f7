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
