package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Boundary vectors mirror the reference's own codec tests
  * (reference: src/columnfile_test.cc:305-341).
  */
class VarintSpec extends AnyFunSuite {
  private val boundaryVectors: Seq[Long] = Seq(
    0L, 0x10L, 0x7fL, 0x80L, 0x100L, 0x1000L, 0x3fffL, 0x4000L, 0x10000L,
    0x100000L, 0x1fffffL, 0x200000L, 0x1000000L, 0xfffffffL, 0x10000000L,
    0xffffffffL)

  test("round-trip at all width boundaries, buffer fully consumed") {
    boundaryVectors.foreach { v =>
      val buf = new ByteBuf()
      Varint.put(buf, v)
      val arr = buf.toArray
      val cur = new Cursor(0)
      assert(Varint.get(arr, cur) === v, s"value $v")
      assert(cur.pos === arr.length, s"value $v leaves trailing bytes")
    }
  }

  test("first byte is never >= 0xc0 (control-byte invariant)") {
    boundaryVectors.foreach { v =>
      val buf = new ByteBuf()
      Varint.put(buf, v)
      assert((buf.toArray.head & 0xc0) !== 0xc0, s"value $v")
    }
  }

  test("property: round-trip over full uint32 range (seeded random)") {
    val rnd = new scala.util.Random(42)
    (1 to 5000).foreach { _ =>
      val v = rnd.nextLong() & 0xffffffffL
      val buf = new ByteBuf()
      Varint.put(buf, v)
      val cur = new Cursor(0)
      assert(Varint.get(buf.toArray, cur) === v)
      assert(cur.pos === buf.size)
    }
  }

  test("zigzag round-trip incl. boundary negatives") {
    val vectors = boundaryVectors.filter(_ <= Int.MaxValue).map(_.toInt) ++
      Seq(-1, -0x10, -0x7fffffff, Int.MinValue, Int.MaxValue)
    vectors.foreach { v =>
      assert(Varint.unzigzag(Varint.zigzag(v)) === v, s"value $v")
    }
    val rnd = new scala.util.Random(7)
    (1 to 5000).foreach { _ =>
      val v = rnd.nextInt()
      assert(Varint.unzigzag(Varint.zigzag(v)) === v)
    }
  }

  test("five-byte varint above uint32 range is rejected") {
    // 5th byte > 0x1f ⇒ "integer out of range"
    val bad = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x20)
    assertThrows[CorruptColumnFileException] {
      Varint.get(bad, new Cursor(0))
    }
  }

  test("truncated varint is rejected") {
    assertThrows[CorruptColumnFileException] {
      Varint.get(Array[Byte](0x80.toByte), new Cursor(0))
    }
  }
}
