package graft.format

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip coverage mirroring the reference's canonical fixture
  * (reference: src/columnfile_test.cc:52-211): 3 columns, a mid-stream
  * flush creating two chunks, a NULL row, a 0xfff-byte value, all codecs.
  */
class RoundTripSpec extends AnyFunSuite {
  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  private val allCodecs = Seq(
    Compression.None, Compression.Snappy, Compression.LZ4,
    Compression.LZMA, Compression.ZLIB, Compression.ZSTD)

  /** The A1 fixture: sorted dates (prefix coding), repeated months (RLE),
    * mixed strings, one NULL row, one 4095-byte value.
    */
  private def writeFixture(codec: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new ColumnFileWriter(bos, codec)
    val longString = "x" * 0xfff
    w.put(0, b("2000-01-01")); w.put(1, b("January")); w.put(2, b("First"))
    w.put(0, b("2000-01-02")); w.put(1, b("January")); w.put(2, b("Second"))
    w.put(0, b("2000-01-03")); w.put(1, b("January")); w.put(2, b("Third"))
    w.flush() // explicit mid-stream flush ⇒ two chunks
    w.put(0, b("2000-02-01")); w.put(1, b("February")); w.put(2, b(longString))
    w.put(0, b("2000-02-02")); w.putNull(1); w.putNull(2)
    w.finish()
    bos.toByteArray
  }

  private def readAll(bytes: Array[Byte]): Seq[Seq[(Int, Option[String])]] = {
    val r = ColumnFileReader.open(bytes)
    val rows = Seq.newBuilder[Seq[(Int, Option[String])]]
    while (!r.end) rows += r.getRow().map { case (c, v) =>
      (c, v.map(new String(_, UTF_8)))
    }
    rows.result()
  }

  test("fixture round-trips exactly under every codec") {
    val longString = "x" * 0xfff
    val expected = Seq(
      Seq(0 -> Some("2000-01-01"), 1 -> Some("January"), 2 -> Some("First")),
      Seq(0 -> Some("2000-01-02"), 1 -> Some("January"), 2 -> Some("Second")),
      Seq(0 -> Some("2000-01-03"), 1 -> Some("January"), 2 -> Some("Third")),
      Seq(0 -> Some("2000-02-01"), 1 -> Some("February"), 2 -> Some(longString)),
      Seq(0 -> Some("2000-02-02"), 1 -> None, 2 -> None))
    allCodecs.foreach { codec =>
      assert(readAll(writeFixture(codec)) === expected,
        s"codec ${Compression.name(codec)}")
    }
  }

  test("file has the reference magic and two chunks") {
    val bytes = writeFixture(Compression.LZ4)
    assert(bytes.take(4).toSeq === ColumnFile.Magic.toSeq)
    val chunks = ColumnFileReader.scanChunks(new BytesInput(bytes))
    assert(chunks.length === 2)
    assert(chunks.head.fields.map(_._1).toSeq === Seq(0, 1, 2))
  }

  test("column filter reads only selected columns") {
    val bytes = writeFixture(Compression.LZ4)
    val r = ColumnFileReader.open(bytes)
    r.setColumnFilter(Seq(1))
    val rows = Seq.newBuilder[Seq[(Int, Option[String])]]
    while (!r.end) rows += r.getRow().map { case (c, v) =>
      (c, v.map(new String(_, UTF_8)))
    }
    assert(rows.result() === Seq(
      Seq(1 -> Some("January")), Seq(1 -> Some("January")),
      Seq(1 -> Some("January")), Seq(1 -> Some("February")),
      Seq(1 -> None)))
  }

  test("RLE collapses repeats; prefix coding shrinks sorted strings") {
    // 10k identical values must encode to a handful of bytes.
    val w = new ColumnWriter
    (1 to 10000).foreach(_ => w.put(b("same-value")))
    val rle = w.finishChunk()
    assert(rle.length < 32, s"RLE block unexpectedly large: ${rle.length}")

    // Sorted URLs: front-coded block must be much smaller than raw.
    val urls = (1 to 1000).map(i => f"http://www.example.org/page-$i%08d.html")
    val w2 = new ColumnWriter
    urls.foreach(u => w2.put(b(u)))
    val coded = w2.finishChunk()
    val rawSize = urls.map(_.length + 3).sum
    assert(coded.length < rawSize / 2,
      s"prefix coding ineffective: ${coded.length} vs raw $rawSize")
  }

  test("property: arbitrary nullable binary rows round-trip (all codecs)") {
    val rnd = new scala.util.Random(42)
    def randomCell(): Option[Array[Byte]] =
      if (rnd.nextInt(5) == 0) None
      else {
        val n = rnd.nextInt(64)
        val arr = new Array[Byte](n); rnd.nextBytes(arr); Some(arr)
      }
    (1 to 60).foreach { trial =>
      val codec = allCodecs(trial % allCodecs.length)
      val rows = List.fill(rnd.nextInt(30) + 1)(List.fill(3)(randomCell()))
      val bos = new ByteArrayOutputStream()
      val w = new ColumnFileWriter(bos, codec)
      rows.foreach { r =>
        r.zipWithIndex.foreach {
          case (Some(v), c) => w.put(c, v)
          case (None, c)    => w.putNull(c)
        }
      }
      w.finish()
      val got = {
        val r = ColumnFileReader.open(bos.toByteArray)
        val out = Seq.newBuilder[Seq[Option[Seq[Byte]]]]
        while (!r.end) out += r.getRow().map(_._2.map(_.toSeq))
        out.result()
      }
      val expected = rows.map(_.map(_.map(_.toSeq)))
      assert(got === expected, s"trial $trial codec ${Compression.name(codec)}")
    }
  }

  test("dictionary columns round-trip exactly under every codec (mixed with plain)") {
    val rnd = new scala.util.Random(7)
    val cats = (0 until 12).map(i => s"category_value_$i".getBytes)
    (1 to 30).foreach { trial =>
      val codec = allCodecs(trial % allCodecs.length)
      val rows = List.fill(rnd.nextInt(200) + 1) {
        val c0 = if (rnd.nextInt(8) == 0) None else Some(cats(rnd.nextInt(cats.length)))
        val c1 = if (rnd.nextInt(8) == 0) None else {
          val a = new Array[Byte](rnd.nextInt(24)); rnd.nextBytes(a); Some(a)
        }
        List(c0, c1)
      }
      val bos = new ByteArrayOutputStream()
      val w = new ColumnFileWriter(bos, codec)
      w.setDictionaryColumns(Set(0)) // col 0 dict, col 1 plain
      rows.foreach { r =>
        r.zipWithIndex.foreach {
          case (Some(v), c) => w.put(c, v)
          case (None, c)    => w.putNull(c)
        }
        if (rnd.nextInt(50) == 0) w.flush() // multi-chunk
      }
      w.finish()
      val got = {
        val r = ColumnFileReader.open(bos.toByteArray)
        val out = Seq.newBuilder[Seq[Option[Seq[Byte]]]]
        while (!r.end) out += r.getRow().map(_._2.map(_.toSeq))
        out.result()
      }
      assert(got === rows.map(_.map(_.map(_.toSeq))),
        s"trial $trial codec ${Compression.name(codec)}")
    }
  }

  test("dictionary shrinks unsorted categorical columns; high cardinality bails to plain bytes") {
    val rnd = new scala.util.Random(11)
    // distinct prefixes: front-coding gets no purchase (the case the
    // reference's prefix coding misses and the dictionary exists for)
    val cats = Seq("common_crawl_2024", "wikipedia_en", "github_code",
      "arxiv_papers", "stack_exchange", "books3_corpus", "openwebtext2",
      "pubmed_central", "freelaw_opinions", "uspto_backgrounds",
      "youtube_subtitles", "hackernews_threads", "europarl_translations",
      "gutenberg_books", "ubuntu_irc_logs", "nih_exporter",
      "philpapers_dump", "opensubtitles_v2", "dm_mathematics",
      "enron_emails").map(_.getBytes)
    def fileBytes(dict: Boolean, values: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val w = new ColumnFileWriter(bos, Compression.None)
      if (dict) w.setDictionaryColumns(Set(0))
      values.foreach(w.put(0, _))
      w.finish()
      bos.toByteArray
    }
    // unsorted categorical: RLE/prefix coding can't help, dictionary must
    val cat = Seq.fill(50000)(cats(rnd.nextInt(cats.length)))
    val plain = fileBytes(dict = false, cat)
    val dicted = fileBytes(dict = true, cat)
    assert(dicted.length * 4 < plain.length,
      s"dict ${dicted.length} vs plain ${plain.length}")
    // high cardinality: the finish-time bail-out emits the IDENTICAL
    // plain encoding — enabling the option can never grow a file
    val uniq = (0 until 10000).map(i => s"unique_value_$i".getBytes)
    assert(fileBytes(dict = true, uniq).toSeq == fileBytes(dict = false, uniq).toSeq)
  }

  test("ragged rows: columns absent from a chunk are simply not returned") {
    val bos = new ByteArrayOutputStream()
    val w = new ColumnFileWriter(bos, Compression.None)
    w.put(0, b("a")); w.put(1, b("b"))
    w.flush()
    w.put(0, b("c")) // second chunk has only column 0
    w.finish()
    assert(readAll(bos.toByteArray) === Seq(
      Seq(0 -> Some("a"), 1 -> Some("b")),
      Seq(0 -> Some("c"))))
  }

  test("appending to existing output skips magic") {
    val bos = new ByteArrayOutputStream()
    val w1 = new ColumnFileWriter(bos, Compression.None)
    w1.put(0, b("one")); w1.finish()
    val w2 = new ColumnFileWriter(bos, Compression.None, writeMagic = false)
    w2.put(0, b("two")); w2.finish()
    assert(readAll(bos.toByteArray) ===
      Seq(Seq(0 -> Some("one")), Seq(0 -> Some("two"))))
  }
}

class ReaderCursorSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.format._

  private def sample(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ColumnFileWriter(bos)
    for (i <- 0 until 3) { w.put(0, s"a$i".getBytes); w.put(1, s"b$i".getBytes) }
    w.flush() // chunk 1
    for (i <- 3 until 5) { w.put(0, s"a$i".getBytes); w.putNull(1) }
    w.close() // chunk 2
    bos.toByteArray
  }

  test("peekRow does not consume; getRow returns the peeked row") {
    val r = ColumnFileReader.open(sample())
    val p = r.peekRow()
    assert(p == r.peekRow())        // stable
    assert(p == r.getRow())         // consumed once
    assert(r.getRow() != p)
  }

  test("endOfSegment flips at chunk boundaries") {
    val r = ColumnFileReader.open(sample())
    assert(!r.end)
    r.getRow(); r.getRow()
    assert(!r.endOfSegment)
    r.getRow()                      // last row of chunk 1
    assert(r.endOfSegment)
    r.getRow()                      // first row of chunk 2
    assert(!r.endOfSegment)
  }

  test("seekToStartOfSegment re-decodes the current chunk") {
    def render(row: Seq[(Int, Option[Array[Byte]])]): String =
      row.map { case (c, v) => s"$c=${v.map(new String(_))}" }.mkString(",")
    val r = ColumnFileReader.open(sample())
    val first = render(r.getRow())
    r.getRow()
    r.seekToStartOfSegment()
    assert(render(r.getRow()) == first)
  }

  test("property: random get/peek/getRow interleavings match a queue model") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      // random ragged 1-3 chunk file over columns 0..2
      val bos = new java.io.ByteArrayOutputStream()
      val w = new ColumnFileWriter(bos)
      val chunkModels = scala.collection.mutable.ArrayBuffer
        .empty[Map[Int, List[Option[String]]]]
      for (c <- 0 until 1 + rnd.nextInt(3)) {
        val cols = (0 until 3).filter(_ => rnd.nextBoolean()) match {
          case Seq() => Seq(0)
          case s => s
        }
        val rows = 1 + rnd.nextInt(4)
        val m = cols.map { col =>
          col -> (0 until rows).map { r =>
            if (rnd.nextInt(4) == 0) { w.putNull(col); None }
            else { val v = s"c$c-r$r-$col"; w.put(col, v.getBytes); Some(v) }
          }.toList
        }.toMap
        w.flush()
        chunkModels += m
      }
      w.finish()
      val r = ColumnFileReader.open(bos.toByteArray)

      // queue model with lazy chunk advance
      var queues = Map.empty[Int, scala.collection.mutable.Queue[Option[String]]]
      var next = 0
      def live = queues.values.exists(_.nonEmpty)
      def advance(): Boolean = {
        while (!live) {
          if (next >= chunkModels.length) return false
          queues = chunkModels(next).map { case (c, vs) =>
            c -> scala.collection.mutable.Queue(vs: _*)
          }
          next += 1
        }
        true
      }
      var steps = 0
      while (advance() && steps < 200) {
        steps += 1
        rnd.nextInt(3) match {
          case 0 =>
            val c = rnd.nextInt(3)
            val want = queues.get(c).filter(_.nonEmpty).map(_.head)
            assert(r.peek(c).map(new String(_)) == want.flatten,
              s"peek($c) mismatch")
          case 1 =>
            val c = rnd.nextInt(3)
            val want = queues.get(c).filter(_.nonEmpty).map(_.dequeue())
            assert(r.get(c).map(new String(_)) == want.flatten,
              s"get($c) mismatch")
          case 2 =>
            val want = queues.toSeq.sortBy(_._1).collect {
              case (c, q) if q.nonEmpty => (c, q.dequeue())
            }
            val got = r.getRow().map { case (c, v) => (c, v.map(new String(_))) }
            assert(got == want, s"getRow mismatch: $got vs $want")
        }
      }
      assert(r.end == !advance())
    }
  }

  test("get/peek are column-granular cursors (reference Get/Peek semantics)") {
    val r = ColumnFileReader.open(sample())
    // peek never consumes
    assert(r.peek(1).map(new String(_)) == Some("b0"))
    assert(r.peek(1).map(new String(_)) == Some("b0"))
    // get advances ONLY that column's cursor
    assert(r.get(1).map(new String(_)) == Some("b0"))
    assert(r.get(1).map(new String(_)) == Some("b1"))
    // column 0's cursor is untouched by reads of column 1
    assert(r.get(0).map(new String(_)) == Some("a0"))
    // getRow picks up each column at its own cursor
    val row = r.getRow().map { case (c, v) => (c, v.map(new String(_))) }
    assert(row == Seq((0, Some("a1")), (1, Some("b2"))))
    // column 1 exhausted within chunk 1 => NULL; column 0 still has a2
    assert(r.get(1).isEmpty)
    assert(r.get(0).map(new String(_)) == Some("a2"))
    // chunk 2: column 1 holds genuine NULLs
    assert(r.get(0).map(new String(_)) == Some("a3"))
    assert(r.get(1).isEmpty)
    assert(!r.end)
  }
}
