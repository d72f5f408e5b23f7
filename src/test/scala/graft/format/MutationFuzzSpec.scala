package graft.format

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Random mutation fuzz over files that exercise every encoding path we
  * own — dictionary blocks, prefix coding, RLE, NULL runs, multi-chunk —
  * under both raw and lz4 framing. Contract (reference parity, no
  * checksums): any mutation either reads successfully (payload bit flips
  * change VALUES silently — documented) or raises a clean
  * `CorruptColumnFileException`. Any other throwable (negative-size
  * allocations, index errors, codec library leaks) is a reader bug —
  * this property is exactly what catches count/length-narrowing classes.
  */
class MutationFuzzSpec extends AnyFunSuite {

  private def buildValid(codec: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new ColumnFileWriter(bos, codec)
    w.setDictionaryColumns(Set(1))
    w.setPackedColumns(Map(3 -> 8, 4 -> 8, 5 -> 8, 6 -> 8))
    val cats = Seq("alpha", "beta", "gamma", "delta")
    def le64(v: Long): Array[Byte] =
      Array.tabulate(8)(k => ((v >>> (8 * k)) & 0xff).toByte)
    (0 until 400).foreach { i =>
      w.put(0, s"sorted-key-$i%06d".getBytes) // prefix coding
      if (i % 7 == 0) w.putNull(1)
      else w.put(1, cats(i % cats.length).getBytes) // dictionary
      w.put(2, Array.fill(4)((i % 251).toByte))     // RLE-ish
      if (i % 11 == 3) w.putNull(3)
      else { // sorted constant-step: the zigzag delta-FOR mode (code 11)
        val v = 7000000L + i * 13
        w.put(3, le64(v))
      }
      if (i % 13 == 6) w.putNull(4)
      else { // tidy decimals: the scaled-decimal double mode (code 9)
        val d = (90000L + i * 37 % 9973).toDouble / 100.0
        w.put(4, le64(java.lang.Double.doubleToRawLongBits(d)))
      }
      // float-precision non-decimals: the XOR-delta double mode (code 10)
      w.put(5, le64(java.lang.Double.doubleToRawLongBits(
        (i * 0.37f + 1.5f).toDouble)))
      // shuffled narrow range: raw frame-of-reference (code 8) — kept
      // in the corpus now that col 3's sorted values pick delta-FOR
      w.put(6, le64(7000000L + (i * 2654435761L) % 9973))
      if (i == 200) w.flush()                        // two chunks
    }
    w.finish()
    bos.toByteArray
  }

  /** Reads up to a row cap: a flipped RLE repeat-count varint encodes a
    * legitimately HUGE file (one value repeated 2^31 times is a few
    * bytes — that IS the run-length encoding), so unbounded row counts
    * are valid output, not a reader bug. The property under test is the
    * exception class, plus termination within the cap.
    */
  private def drain(bytes: Array[Byte]): Unit = {
    val r = ColumnFileReader.open(bytes)
    var rows = 0
    while (!r.end && rows < 100000) {
      r.getRow()
      rows += 1
    }
  }

  test("byte flips and truncations: success or CorruptColumnFileException, nothing else") {
    val rnd = new scala.util.Random(0xC0FFEE)
    Seq(Compression.None, Compression.LZ4, Compression.ZSTD).foreach { codec =>
      val valid = buildValid(codec)
      drain(valid) // sanity
      (1 to 400).foreach { trial =>
        val mutated =
          if (trial % 3 == 0) valid.take(rnd.nextInt(valid.length))
          else {
            val m = valid.clone()
            (0 until 1 + rnd.nextInt(4)).foreach { _ =>
              m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
            }
            m
          }
        try drain(mutated)
        catch {
          case _: CorruptColumnFileException => // the clean error class
          case t: Throwable =>
            fail(s"codec ${Compression.name(codec)} trial $trial: " +
              s"leaked ${t.getClass.getName}: ${t.getMessage}")
        }
      }
    }
  }
}
