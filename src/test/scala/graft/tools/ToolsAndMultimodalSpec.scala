package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MultimodalOps

class ToolsAndMultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("tools-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmp(): String = Files.createTempDirectory("cf-tools").toString

  test("cfCat: filter + select + recompress parity") {
    val sp = spark; import sp.implicits._
    val src = tmp()
    (0 until 100).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
      .write.format("columnfile").mode("overwrite").save(src)

    val out = CfTools.cat(spark, Seq(src),
      filters = Seq(("name", "name_1")), select = Seq("id", "name"))
    val got = out.collect().map(_.getLong(0)).sorted
    val want = (0 until 100).filter(i => s"name_$i".contains("name_1")).map(_.toLong)
    assert(got.toSeq == want)

    // recompress to zlib and read back
    val dst = tmp()
    CfTools.writeCat(out, dst, "columnfile", "zlib")
    assert(spark.read.format("columnfile").load(dst).count() == want.size)

    // tsv output path
    val tsvDir = tmp()
    CfTools.writeCat(out, tsvDir, "tsv")
    val lines = spark.read.option("sep", "\t").csv(tsvDir).count()
    assert(lines == want.size)
  }

  test("cfSort: whole-row sort, NULLS FIRST, multi-input merge") {
    val sp = spark; import sp.implicits._
    val a = tmp(); val b = tmp()
    Seq((3L, "c"), (1L, "a")).toDF("k", "v")
      .write.format("columnfile").mode("overwrite").save(a)
    sp.sql("SELECT CAST(NULL AS BIGINT) AS k, 'n' AS v UNION ALL SELECT 2, 'b'")
      .write.format("columnfile").mode("overwrite").save(b)

    val sorted = CfTools.sort(spark, Seq(a, b))
    val got = sorted.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((-1L, "n"), (1L, "a"), (2L, "b"), (3L, "c")))

    val out = tmp()
    CfTools.writeSorted(sorted, out)
    assert(spark.read.format("columnfile").load(out).count() == 4)
  }

  test("compact rewrites many small files into few, preserving rows; sort restores pruning") {
    val sp = spark; import sp.implicits._
    val in = tmp()
    (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(20) // 20 small files
      .write.format("columnfile").mode("overwrite").save(in)
    assert(new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".cf")) == 20)

    val out = tmp()
    CfTools.compact(spark, in, out, targetFileBytes = Long.MaxValue,
      sortWithinBy = Seq("id"), targetChunkBytes = 8192)
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".cf")) == 1)
    val back = spark.read.format("columnfile").load(out)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) ==
      (0L until 5000L).sum)
    // sorted output restores selective stats pruning
    val parts = spark.read.format("columnfile").option("maxPartitionBytes", "1")
      .load(out).filter(col("id") >= 4990).rdd.getNumPartitions
    val all = spark.read.format("columnfile").option("maxPartitionBytes", "1")
      .load(out).rdd.getNumPartitions
    assert(all > 2 && parts <= 2, s"pruning after compact: $parts of $all")
  }

  test("compact re-encodes with dictionary + bitpack: same rows, smaller files") {
    val sp = spark; import sp.implicits._
    val in = tmp()
    (0 until 20000)
      .map(i => (7000000000L + i, s"cat_${i % 6}", 1700000000L + (i % 89) * 60))
      .toDF("id", "category", "ts")
      .repartition(1).write.format("columnfile")
      .option("compression", "none").mode("overwrite").save(in)

    val out = tmp()
    CfTools.compact(spark, in, out, targetFileBytes = Long.MaxValue,
      compression = "none", dictionary = true, bitpack = true)
    val back = spark.read.format("columnfile").load(out)
    assert(back.count() == 20000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"),
      org.apache.spark.sql.functions.sum("ts")).head.toSeq ==
      spark.read.format("columnfile").load(in)
        .agg(org.apache.spark.sql.functions.sum("id"),
          org.apache.spark.sql.functions.sum("ts")).head.toSeq)
    def bytes(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".cf")).map(_.length()).sum
    assert(bytes(out) * 2 < bytes(in),
      s"re-encode shrink: ${bytes(out)} vs ${bytes(in)}")
  }

  test("z-order compaction prunes on EVERY z column; linear sort only on its leading one") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val src = java.nio.file.Files.createTempDirectory("cf-zorder-src").toString
    // two independent uniform key columns
    (0 until 60000).map { i =>
      (i.toLong, (i % 251).toLong, ((i * 7919) % 257).toLong)
    }.toDF("id", "x", "y")
      .repartition(8).write.format("columnfile").mode("overwrite").save(src)

    def pruned(dir: String, c: String): (Int, Int) = {
      val t = spark.read.format("columnfile")
        .option("maxPartitionBytes", "1").load(dir)
      (t.filter(col(c) === 17L).rdd.getNumPartitions, t.rdd.getNumPartitions)
    }

    val zDir = java.nio.file.Files.createTempDirectory("cf-zorder-z").toString
    CfTools.compact(spark, src, zDir, targetFileBytes = 1L << 40,
      targetChunkBytes = 16 * 1024, zOrderBy = Seq("x", "y"))
    val linDir = java.nio.file.Files.createTempDirectory("cf-zorder-lin").toString
    CfTools.compact(spark, src, linDir, targetFileBytes = 1L << 40,
      targetChunkBytes = 16 * 1024, sortWithinBy = Seq("x", "y"))

    // correctness: nothing lost by the rewrite
    assert(spark.read.format("columnfile").load(zDir).count() == 60000)
    assert(spark.read.format("columnfile").load(zDir)
      .filter(col("x") === 17L).count() ==
      (0 until 60000).count(_ % 251 == 17))

    // z-order: BOTH columns prune well
    val (zx, zAll) = pruned(zDir, "x")
    val (zy, _) = pruned(zDir, "y")
    assert(zx * 3 <= zAll, s"x pruning weak under z-order: $zx of $zAll")
    assert(zy * 3 <= zAll, s"y pruning weak under z-order: $zy of $zAll")
    // linear sort: x prunes, y does not (y values spread over every chunk)
    val (lx, lAll) = pruned(linDir, "x")
    val (ly, _) = pruned(linDir, "y")
    assert(lx * 3 <= lAll, s"x pruning weak under linear sort: $lx of $lAll")
    assert(ly * 2 > lAll, s"y unexpectedly pruned under linear sort: $ly of $lAll")
  }

  test("clean sweeps crashed in-progress files + orphaned sidecars, never live data") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cf-clean").toString
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("overwrite").save(dir)
    val data = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".cf")).head
    // crashed micro-batch leftovers: in-progress data file + its sidecar
    java.nio.file.Files.copy(data.toPath,
      new java.io.File(dir, ".part-e0000000007-00000-dead.cf").toPath)
    java.nio.file.Files.write(
      new java.io.File(dir, "..part-e0000000007-00000-dead.cf" +
        graft.spark.ChunkStatsIndex.Suffix).toPath, "{}".getBytes)
    // sidecar orphaned by an out-of-band data-file deletion
    java.nio.file.Files.write(
      new java.io.File(dir, ".gone.cf" +
        graft.spark.ChunkStatsIndex.Suffix).toPath, "{}".getBytes)
    assert(spark.read.format("columnfile").load(dir).count() == 100)

    // age guard: nothing young enough is touched
    assert(CfTools.clean(spark, dir, minAgeMs = 3600L * 1000) == 0)
    // with the guard off the three orphans go; live data + sidecar stay
    assert(CfTools.clean(spark, dir, minAgeMs = 0L) == 3)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.contains(data.getName))
    assert(names.contains("." + data.getName + graft.spark.ChunkStatsIndex.Suffix))
    assert(!names.exists(_.contains("dead")) && !names.exists(_.contains("gone")))
    assert(spark.read.format("columnfile").load(dir).count() == 100)
    // idempotent
    assert(CfTools.clean(spark, dir, minAgeMs = 0L) == 0)

    // temps referenced by an epoch INTENT marker are committed data
    // awaiting publish — protected at any age; stale dot-intent temp
    // markers are swept
    val tmp2 = new java.io.File(dir, ".part-e0000000008-00000-live.cf")
    java.nio.file.Files.copy(data.toPath, tmp2.toPath)
    val epochs = new java.io.File(dir, "_epochs"); epochs.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(epochs, "8").toPath,
      s"${tmp2.getAbsolutePath}\t${new java.io.File(dir, "part-e0000000008-00000-live.cf").getAbsolutePath}\n")
    java.nio.file.Files.writeString(
      new java.io.File(epochs, ".9.intent").toPath, "stale")
    assert(CfTools.clean(spark, dir, minAgeMs = 0L) == 1, "only the stale intent")
    assert(tmp2.exists(), "marker-referenced temp must survive the sweep")
    assert(!new java.io.File(epochs, ".9.intent").exists())
  }

  test("multimodal: stub decode adds typed meta, deterministic") {
    val sp = spark; import sp.implicits._
    val df = sp.sql(
      "SELECT id, CAST(concat('payload_', id) AS BINARY) AS payload FROM range(50)")
    val dec = MultimodalOps.decode(df, "payload")
    assert(dec.schema.fieldNames.contains("meta"))
    val rows = dec.select("id", "meta.width", "meta.height", "meta.modality", "meta.ok")
      .collect()
    assert(rows.length == 50 && rows.forall(_.getBoolean(4)))
    // deterministic: same input -> same meta
    val again = MultimodalOps.decode(df, "payload")
      .select("id", "meta.width").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getInt(1)))
  }

  test("multimodal: real PNG/JPEG/GIF headers decode to true dimensions") {
    val sp = spark; import sp.implicits._
    val cases = Seq(
      (1L, MultimodalOps.pngBytes(640, 480), 640, 480, "png"),
      (2L, MultimodalOps.jpegBytes(1920, 1080), 1920, 1080, "jpeg"),
      (3L, MultimodalOps.gifBytes(320, 200), 320, 200, "gif"))
    val df = cases.map(c => (c._1, c._2)).toDF("id", "payload")
    val got = MultimodalOps.decode(df, "payload")
      .select("id", "meta.width", "meta.height", "meta.modality", "meta.ok")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getBoolean(4))).sortBy(_._1)
    assert(got.toSeq == cases.map(c => (c._1, c._3, c._4, c._5, true)))
    // direct parser checks, incl. JPEG marker walking past APP segments
    assert(MultimodalOps.parseImage(MultimodalOps.pngBytes(7, 9))
      .contains((7, 9, "png")))
    assert(MultimodalOps.parseImage(Array[Byte](1, 2, 3)).isEmpty)
    assert(MultimodalOps.parseImage(Array.empty[Byte]).isEmpty)
    // truncated containers are rejected, not mis-parsed
    assert(MultimodalOps.parseImage(
      MultimodalOps.pngBytes(7, 9).take(12)).isEmpty)
    assert(MultimodalOps.parseImage(
      MultimodalOps.jpegBytes(7, 9).take(6)).isEmpty)
  }

  test("multimodal: real WAV/MP4 headers decode to true audio/video metadata") {
    val sp = spark; import sp.implicits._
    val cases = Seq(
      (1L, MultimodalOps.wavBytes(44100, 2), 0, 0, 44100, 2, "wav"),
      (2L, MultimodalOps.wavBytes(8000, 1), 0, 0, 8000, 1, "wav"),
      (3L, MultimodalOps.mp4Bytes(1920, 1080), 1920, 1080, 0, 0, "mp4"),
      (4L, MultimodalOps.mp4Bytes(1, 1), 1, 1, 0, 0, "mp4"))
    val df = cases.map(c => (c._1, c._2)).toDF("id", "payload")
    val got = MultimodalOps.decode(df, "payload")
      .select("id", "meta.width", "meta.height", "meta.sample_rate",
        "meta.channels", "meta.modality", "meta.ok")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getString(5), r.getBoolean(6))).sortBy(_._1)
    assert(got.toSeq == cases.map(c => (c._1, c._3, c._4, c._5, c._6, c._7, true)))
    // the WAV walk must skip the leading JUNK subchunk (fmt is NOT first)
    assert(MultimodalOps.parseWav(MultimodalOps.wavBytes(22050, 6))
      .contains((22050, 6)))
    // truncated/malformed containers rejected, not mis-parsed
    assert(MultimodalOps.parseWav(MultimodalOps.wavBytes(22050, 6).take(20)).isEmpty)
    assert(MultimodalOps.parseWav("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(MultimodalOps.parseMp4(MultimodalOps.mp4Bytes(10, 10).take(30)).isEmpty)
    assert(MultimodalOps.parseMp4(Array.fill[Byte](40)(0)).isEmpty)
    // a zero-size box must not loop the walker forever
    val evil = MultimodalOps.mp4Bytes(10, 10)
    evil(16) = 0; evil(17) = 0; evil(18) = 0; evil(19) = 0 // moov size := 0
    assert(MultimodalOps.parseMp4(evil).contains((10, 10)) ||
      MultimodalOps.parseMp4(evil).isEmpty) // either is sound; just terminate
  }

  test("multimodal: frame sampling and resize stubs") {
    val sp = spark
    val df = sp.sql(
      "SELECT id, CAST(repeat('x', 100) AS BINARY) AS payload FROM range(5)")
    val frames = MultimodalOps.frameSample(df, "payload", 4)
      .select(size(col("frames"))).collect()
    assert(frames.forall(_.getInt(0) == 4))
    val resized = MultimodalOps.resize(df, "payload", 10)
      .select(octet_length(col("payload_resized"))).collect()
    assert(resized.forall(_.getInt(0) == 10))
  }

  test("multimodal: REAL nearest-neighbor resize — floor mapping, container-blind, unparseable") {
    // unit mapping: 4x2 -> 2x1 samples src (x*4/2, y*2/1) = indices 0, 2
    val small = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    assert(MultimodalOps.resizeRaster(4, 2, small, 2, 1)
      .sameElements(Array[Byte](10, 30)))

    // perturbation survival through 18x16 -> 12x10: sampled rows are
    // {0,1,3,4,6,8,9,11,12,14}, sampled cols {0,1,3,4,6,7,9,10,12,13,15,16}.
    // idx 0 = (row 0, col 0) is sampled; idx 53 = (row 2, col 17) is not.
    val base = Array.tabulate(288)(i => (i % 251).toByte)
    def perturb(idx: Int): Array[Byte] = {
      val p = base.clone(); p(idx) = ((p(idx) + 1) % 251).toByte; p
    }
    val rzBase = MultimodalOps.resizeRaster(18, 16, base, 12, 10)
    assert(!MultimodalOps.resizeRaster(18, 16, perturb(0), 12, 10)
      .sameElements(rzBase))
    assert(MultimodalOps.resizeRaster(18, 16, perturb(53), 12, 10)
      .sameElements(rzBase))

    // seam: PGM and BMP of the same raster yield the same rdigest;
    // an unparseable payload yields nulls
    val sp = spark; import sp.implicits._
    val df = Seq(
      (0L, MultimodalOps.pgmBytes(18, 16, base)),
      (1L, MultimodalOps.bmpBytes(18, 16, base)),
      (2L, Array[Byte](9, 9, 9))).toDF("id", "payload")
    val out = MultimodalOps.resizeDigests(df, "payload", 12, 10)
      .select("id", "pdigest", "rdigest").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.getString(2))))
      .toMap
    assert(out(0L)._2.isDefined && out(0L) == out(1L))
    assert(out(0L)._1 != out(0L)._2) // resize changes the digest
    assert(out(2L) == ((None, None)))
  }

  test("multimodal: REAL frame sampling — mdat walk, stride phase, partial tail, rejections") {
    val P = 2147483647L
    def mdatOf(frames: Array[Array[Byte]], tail: Array[Byte] = Array.empty) =
      MultimodalOps.mp4Bytes(320, 240, frames.flatten ++ tail)
    def expect(frames: Array[Array[Byte]]): Long = {
      var sd = 0L
      frames.indices.by(2).foreach { k =>
        var fd = 0L
        frames(k).foreach(b => fd = (fd * 31 + (b & 0xff)) % P)
        sd = (sd * 37 + fd) % P
      }
      sd
    }
    val frames = Array.tabulate(5)(k =>
      Array.tabulate(16)(i => ((k * 31 + i * 7) % 251).toByte))
    val sp = spark; import sp.implicits._

    def run(payloads: Seq[(Long, Array[Byte])]) =
      MultimodalOps.frameSampleDigests(
        payloads.toDF("id", "payload"), "payload", 16, 2)
        .select("id", "n_frames", "n_sampled", "sdigest").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getLong(2), r.getLong(3))))).toMap

    // phase: frame 1 (odd) is skipped — changing it keeps the digest;
    // frame 2 (even) is kept — changing it breaks the digest. A partial
    // 7-byte tail is not a complete frame and never contributes.
    val odd = frames.clone(); odd(1) = odd(1).map(b => (b + 1).toByte)
    val even = frames.clone(); even(2) = even(2).map(b => (b + 1).toByte)
    val out = run(Seq(
      (0L, mdatOf(frames)),
      (1L, mdatOf(odd)),
      (2L, mdatOf(even)),
      (3L, mdatOf(frames, tail = Array.fill(7)(99.toByte))),
      (4L, Array[Byte](1, 2, 3, 4))))
    assert(out(0L).contains((5L, 3L, expect(frames))))
    assert(out(1L) == out(0L))
    assert(out(2L).exists(_._3 != expect(frames)))
    assert(out(3L) == out(0L))
    assert(out(4L).isEmpty)

    // rewrap invariance: an extra `free` box before mdat moves the byte
    // range but not the sampled content
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val data = frames.flatten
    val free = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("free".getBytes(ascii)).put(Array.fill(8)(0.toByte)).array()
    val mdatBox = java.nio.ByteBuffer.allocate(8 + data.length)
      .putInt(8 + data.length).put("mdat".getBytes(ascii)).put(data).array()
    val rewrapped = MultimodalOps.mp4Bytes(320, 240) ++ free ++ mdatBox
    assert(run(Seq((0L, rewrapped)))(0L).contains((5L, 3L, expect(frames))))
  }

  test("multimodal: PGM parse (comments, whitespace, truncation) + dHash bands") {
    // round-trip with a messy-but-legal header
    val px = Array.tabulate(288)(i => (i % 251).toByte)
    val clean = MultimodalOps.pgmBytes(18, 16, px)
    assert(MultimodalOps.parsePgm(clean).exists {
      case (w, h, p) => w == 18 && h == 16 && p.sameElements(px)
    })
    val messy = ("P5  # a comment\n  18\t16 # dims\n255\n")
      .getBytes("US-ASCII") ++ px
    assert(MultimodalOps.parsePgm(messy).exists {
      case (w, h, p) => w == 18 && h == 16 && p.sameElements(px)
    })
    // rejections: wrong magic, truncated raster, maxval > 255, no digits
    assert(MultimodalOps.parsePgm("P6\n18 16\n255\n".getBytes("US-ASCII") ++ px).isEmpty)
    assert(MultimodalOps.parsePgm(clean.dropRight(1)).isEmpty)
    assert(MultimodalOps.parsePgm("P5\n18 16\n65535\n".getBytes("US-ASCII") ++ px).isEmpty)
    assert(MultimodalOps.parsePgm("P5\nx 16\n255\n".getBytes("US-ASCII") ++ px).isEmpty)

    // dHash intent on planted images: a one-pixel perturbation stays
    // within hamming 3 of its base; a different gradient group is far.
    val sp = spark; import sp.implicits._
    def planted(g: Long, r: Long): Array[Byte] = {
      val pix = Array.tabulate(288) { idx =>
        val base = ((g * (idx + 7) + (g / 251) * (idx.toLong * idx + 13) +
          idx.toLong * idx) % 251).toInt
        (if (idx == ((r * 53) % 288)) ((base + r * 29) % 251).toInt else base).toByte
      }
      MultimodalOps.pgmBytes(18, 16, pix)
    }
    // (g=0, r=3) is a perturbation that provably flips bits (hamming 2
    // to its base); many perturbations land between gradient steps and
    // flip none, which is fine for the operator (hamming-0 pairs) but
    // not for this flip-detection assertion.
    val df = Seq(
      (0L, planted(0, 0)), (1L, planted(0, 3)), (2L, planted(7, 0)),
      (3L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val bands = MultimodalOps.dhashBands(df, "payload")
      .select("id", "b0", "b1", "b2", "b3").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))))
      .toMap
    def hamming(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3) + java.lang.Long.bitCount(a._4 ^ b._4)
    val Seq(h0, h1, h2) = Seq(0L, 1L, 2L).map(bands(_).get)
    assert(bands(3L).isEmpty) // non-PGM payload -> null bands
    assert(h0.productIterator.forall { case v: Long => v >= 0 && v < 65536 })
    assert(hamming(h0, h1) <= 3 && hamming(h0, h1) >= 1)
    assert(hamming(h0, h2) > 4) // different group: no near-dup
  }

  test("multimodal: BMP parse — padding, bottom-up vs top-down, luma, rejections") {
    // a non-multiple-of-4 row width (18*3 = 54 -> stride 56) with an
    // asymmetric raster: any padding or row-order bug changes bytes
    val px = Array.tabulate(288)(i => ((i * 7 + i / 18) % 251).toByte)
    val bottomUp = MultimodalOps.bmpBytes(18, 16, px)
    val topDown = MultimodalOps.bmpBytes(18, 16, px, topDown = true)
    assert(bottomUp.length == 54 + 56 * 16) // padded stride exercised
    // both layouts decode to the SAME top-down raster
    for (bmp <- Seq(bottomUp, topDown))
      assert(MultimodalOps.parseBmp(bmp).exists {
        case (w, h, p) => w == 18 && h == 16 && p.sameElements(px)
      })
    // container-independence: the BMP decodes byte-identically to the
    // PGM of the same raster (the m06 collapse precondition)
    assert(MultimodalOps.parseRaster(bottomUp).get._3
      .sameElements(MultimodalOps.parseRaster(
        MultimodalOps.pgmBytes(18, 16, px)).get._3))
    // BT.601 luma on a non-gray pixel: r=100 g=150 b=200 ->
    // (299*100 + 587*150 + 114*200)/1000 = 140 (integer division)
    val colored = MultimodalOps.bmpBytes(1, 1, Array[Byte](0))
    colored(54) = 200.toByte  // blue
    colored(55) = 150.toByte  // green
    colored(56) = 100.toByte  // red
    assert(MultimodalOps.parseBmp(colored).get._3(0) == 140.toByte)
    // rejections: wrong magic, truncated pixels, 8-bit, RLE compression
    val badMagic = bottomUp.clone(); badMagic(0) = 'X'
    assert(MultimodalOps.parseBmp(badMagic).isEmpty)
    assert(MultimodalOps.parseBmp(bottomUp.dropRight(1)).isEmpty)
    val bpp8 = bottomUp.clone(); bpp8(28) = 8
    assert(MultimodalOps.parseBmp(bpp8).isEmpty)
    val rle = bottomUp.clone(); rle(30) = 1 // BI_RLE8
    assert(MultimodalOps.parseBmp(rle).isEmpty)
    // a BMP that fails the parse yields null bands (not a crash)
    val sp = spark; import sp.implicits._
    val bands = MultimodalOps.dhashBands(
      Seq((0L, bottomUp), (1L, rle)).toDF("id", "payload"), "payload")
      .select("id", "b0").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(bands == Map(0L -> false, 1L -> true))
  }

  test("multimodal: WAV/MP4 content digests — rewrap-invariant, sample-sensitive") {
    val data = Array.tabulate(64)(i => (i * 3 % 251).toByte)
    // identity = PCM/mdat bytes: a different container wrapping (other
    // sample rate / channel count / track dims) digests identically...
    val a1 = MultimodalOps.wavDataDigest(MultimodalOps.wavBytes(16000, 1, data))
    val a2 = MultimodalOps.wavDataDigest(MultimodalOps.wavBytes(8000, 2, data))
    assert(a1.isDefined && a1 == a2)
    val v1 = MultimodalOps.mp4DataDigest(MultimodalOps.mp4Bytes(320, 240, data))
    val v2 = MultimodalOps.mp4DataDigest(MultimodalOps.mp4Bytes(64, 64, data))
    assert(v1.isDefined && v1 == v2)
    // ...while one changed media byte does not
    val tweaked = data.clone(); tweaked(17) = (tweaked(17) + 1).toByte
    assert(MultimodalOps.wavDataDigest(
      MultimodalOps.wavBytes(16000, 1, tweaked)) != a1)
    assert(MultimodalOps.mp4DataDigest(
      MultimodalOps.mp4Bytes(320, 240, tweaked)) != v1)
    // digest matches the shared contentDigest over the raw bytes
    assert(a1.contains(MultimodalOps.contentDigest(data, 0, data.length)))
    assert(v1.contains(MultimodalOps.contentDigest(data, 0, data.length)))
    // rejections: truncated data subchunk / mdat box, no mdat at all,
    // non-RIFF garbage
    assert(MultimodalOps.wavDataDigest(
      MultimodalOps.wavBytes(16000, 1, data).dropRight(1)).isEmpty)
    assert(MultimodalOps.mp4DataDigest(
      MultimodalOps.mp4Bytes(320, 240, data).dropRight(1)).isEmpty)
    assert(MultimodalOps.mp4DataDigest(MultimodalOps.mp4Bytes(320, 240)).isEmpty)
    assert(MultimodalOps.wavDataDigest(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("image admission verdicts: exact copy, near twin, unseen image") {
    val sp = spark; import sp.implicits._
    import graft.queries.ExtQueries.TestSql
    // index: the base images of groups 0 and 1 (planted ids 0 and 5)
    val existing = Seq((0L, TestSql.plantedImage(0L)),
      (5L, TestSql.plantedImage(5L))).toDF("doc_id", "payload")
    // arrivals: a byte-identical copy of image 0 ('exact'), its
    // one-pixel twin that provably flips bits ('dup', hamming 2,
    // sharing bands 0/1/3), and a group-7 image sharing NO band with
    // either index rep ('new') — all verified deterministic offline
    val arrivals = Seq(
      (100L, TestSql.plantedImage(0L)),
      (101L, TestSql.plantedImage(3L)),
      (102L, TestSql.plantedImage(35L))).toDF("doc_id", "payload")
    val got = TestSql.imageAdmission(spark, existing, arrivals)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("exact", 0L, 1L), ("dup", 2L, 1L), ("new", -1L, 1L)),
      s"verdicts: $got")
  }
}
