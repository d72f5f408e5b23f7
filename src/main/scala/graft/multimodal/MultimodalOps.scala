package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode seam parses REAL container headers where that is pure byte
  * reading (PNG / JPEG / GIF dimensions need no codec); payloads in any
  * other format fall back to a clearly-marked deterministic STUB (this
  * container has no image/audio codecs). Everything around the seam —
  * schema, per-partition batching, partitioning — is the production
  * shape: decode runs inside `mapPartitions` so each task amortizes
  * decoder init over its whole partition, and no bytes ever gather to
  * the driver. Frame sampling and resize are pure Catalyst expressions
  * (substring/transform over the binary — codegen'd, no UDF in the hot
  * path).
  */
object MultimodalOps {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  // ---- real header parsing (pure byte reads, no codec needed) ----

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def beShort(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk whose payload starts at
    * byte 16 with big-endian width and height.
    */
  private def parsePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((beInt(b, 16), beInt(b, 20)))
    else None

  /** JPEG: FF D8, then marker segments; the SOFn frame header carries
    * big-endian height then width after a 1-byte precision field.
    */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // no payload
      else {
        val len = beShort(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          return if (i + 9 < b.length) Some((beShort(b, i + 7), beShort(b, i + 5)))
          else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/89a: little-endian logical-screen width/height at bytes 6/8. */
  private def parseGif(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((leShort(b, 6), leShort(b, 8)))
    else None

  /** Header-derived metadata when the payload is a recognized image
    * container; None otherwise.
    */
  def parseImage(payload: Array[Byte]): Option[(Int, Int, String)] =
    parsePng(payload).map { case (w, h) => (w, h, "png") }
      .orElse(parseJpeg(payload).map { case (w, h) => (w, h, "jpeg") })
      .orElse(parseGif(payload).map { case (w, h) => (w, h, "gif") })

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** WAV (RIFF): "RIFF" size "WAVE", then subchunks [id(4) size(4,LE)
    * payload]; the `fmt ` payload carries channels (LE16 at +2) and
    * sample rate (LE32 at +4). Walks the subchunk list rather than
    * assuming `fmt ` comes first — still pure byte reads, no codec.
    */
  def parseWav(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return None
    var i = 12L // Long cursor: a huge declared chunk size must not
    while (i + 8 <= b.length) { //    overflow the position negative
      val j = i.toInt
      val size = leInt(b, j + 4)
      if (b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' ')
        return if (size >= 8 && j + 16 <= b.length)
          Some((leInt(b, j + 12), leShort(b, j + 10))) // (sampleRate, channels)
        else None
      if (size < 0) return None
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** MP4/ISO-BMFF: boxes are [size(4,BE) type(4) payload]; video track
    * dimensions live in `moov/trak/tkhd` as 16.16 fixed-point width and
    * height at the end of the box (offset depends on the tkhd version's
    * 32- vs 64-bit timestamps). Pure byte walking, no codec.
    */
  def parseMp4(b: Array[Byte]): Option[(Int, Int)] = {
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var i = lo
        def hasNext: Boolean = i + 8 <= hi
        def next(): (String, Int, Int) = {
          val size = beInt(b, i)
          val tpe = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val end = if (size <= 0) hi else math.min(hi, i + size)
          val r = (tpe, i + 8, end)
          i = math.max(end, i + 8) // malformed size: never loop in place
          r
        }
      }
    // sanity: an MP4 starts with a well-formed box, typically ftyp
    if (b.length < 16 || beInt(b, 0) < 8) return None
    val hits = for {
      (t1, l1, h1) <- boxes(0, b.length) if t1 == "moov"
      (t2, l2, h2) <- boxes(l1, h1) if t2 == "trak"
      (t3, l3, h3) <- boxes(l2, h2) if t3 == "tkhd"
      if l3 < h3 // version byte exists (empty tkhd payload at EOF)
      off = l3 + (if ((b(l3) & 0xff) == 1) 88 else 76)
      if off + 8 <= h3
    } yield (beInt(b, off) >>> 16, beInt(b, off + 4) >>> 16)
    hits.nextOption()
  }

  /** STUB decoder for unrecognized payloads: deterministic
    * pseudo-metadata from the bytes. A real implementation would demux
    * the container here (audio/video need codecs this box lacks).
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, String, Boolean) = {
    if (payload == null || payload.isEmpty) (0, 0, "empty", false)
    else {
      val n = payload.length
      val b0 = payload(0) & 0xff
      val modality = (n % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      (64 + (n % 640), 64 + ((n * 31 + b0) % 480), modality, true)
    }
  }

  /** Decode/feature-extract over a binary column: per-partition batch
    * processing appending a typed `meta` struct. Real header parse for
    * PNG/JPEG/GIF (dimensions), WAV (sample rate/channels) and MP4
    * (track dimensions); deterministic stub for everything else.
    */
  def decode(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("meta", metaSchema, nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would happen here (once per task)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val meta = Option(payload).flatMap(parseImage) match {
          case Some((w, h, fmt)) => Row(w, h, 0, 0, fmt, true)
          case None => Option(payload).flatMap(parseWav) match {
            case Some((sr, ch)) => Row(0, 0, sr, ch, "wav", true)
            case None => Option(payload).flatMap(parseMp4) match {
              case Some((w, h)) => Row(w, h, 0, 0, "mp4", true)
              case None =>
                val (w, h, m, ok) = stubDecode(payload)
                Row(w, h, 0, 0, m, ok)
            }
          }
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Frame sampling for video-shaped payloads: split the payload into
    * ~`n` equal byte slices ("frames") with pure Catalyst expressions —
    * `substring` over binary inside `transform` keeps the whole thing in
    * whole-stage codegen (no UDF, no boxing). Real version: container
    * demux + keyframe extraction at the same seam.
    */
  def frameSample(df: DataFrame, binaryCol: String, n: Int): DataFrame =
    df.withColumn("frames", expr(
      s"""CASE
         |  WHEN $binaryCol IS NULL OR octet_length($binaryCol) = 0
         |    THEN CAST(array() AS ARRAY<BINARY>)
         |  ELSE transform(
         |    sequence(0, least($n, octet_length($binaryCol)) - 1),
         |    i -> substring($binaryCol,
         |                   i * greatest(1, octet_length($binaryCol) div $n) + 1,
         |                   greatest(1, octet_length($binaryCol) div $n)))
         |END""".stripMargin))

  /** Resize stub: deterministic downsample keeping every `factor`-th
    * byte, as a Catalyst fold over 1-byte substrings (codegen'd; the
    * binary-in/binary-out decode shape a real scaler would have).
    */
  def resize(df: DataFrame, binaryCol: String, factor: Int): DataFrame =
    df.withColumn(s"${binaryCol}_resized", expr(
      s"""CASE
         |  WHEN $binaryCol IS NULL THEN NULL
         |  WHEN octet_length($binaryCol) = 0 THEN $binaryCol
         |  ELSE aggregate(
         |    sequence(1, octet_length($binaryCol), $factor),
         |    CAST('' AS BINARY),
         |    (acc, i) -> concat(acc, substring($binaryCol, i, 1)))
         |END""".stripMargin))

  /** PGM (P5, Netpbm binary graymap): ASCII header `P5 <w> <h> <maxval>`
    * with `#` comments and arbitrary whitespace, one whitespace byte,
    * then w*h raw gray bytes (maxval <= 255). A real container parse —
    * pure byte reads, no codec.
    */
  def parsePgm(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 4 || b(0) != 'P' || b(1) != '5') return None
    var i = 2
    def skipToToken(): Boolean = {
      var in = true
      while (in && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else in = false
      }
      i < b.length
    }
    def readInt(): Option[Int] = {
      if (!skipToToken()) return None
      var v = 0L
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly one whitespace byte separates maxval from the raster
      if i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r')
      if { i += 1; b.length - i >= w.toLong * h }
    } yield (w, h, java.util.Arrays.copyOfRange(b, i, i + w * h))
  }

  /** Perceptual difference-hash (dHash) of a PGM payload: parse the
    * raster, 2x2 integer box-downsample to a 9x8 grid (the input
    * contract is 18x16 — exactly 2x the dHash grid, so the downsample
    * is exact integer arithmetic with no resample kernel ambiguity),
    * then the classic horizontal-gradient hash: bit(x, y) = 1 iff
    * cell(x, y) < cell(x+1, y), 64 bits packed MSB-first into four
    * 16-bit band values (b0..b3) — the band split IS the pigeonhole
    * LSH key downstream. Adds b0..b3 (LongType, null when the payload
    * is not an 18x16 PGM). Runs in `mapPartitions` like [[decode]]:
    * per-task batch work, no driver gather, no UDF registry.
    */
  def dhashBands(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ ((0 until 4).map(t =>
      StructField(s"b$t", LongType, nullable = true)) :+
      StructField("pdigest", StringType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val bands: Seq[Any] = parseRaster(payload) match {
          case Some((18, 16, px)) =>
            def p(cx: Int, cy: Int): Int = px(cy * 18 + cx) & 0xff
            def avg(x: Int, y: Int): Int =
              (p(2 * x, 2 * y) + p(2 * x + 1, 2 * y) +
                p(2 * x, 2 * y + 1) + p(2 * x + 1, 2 * y + 1)) / 4
            val bs = (0 until 4).map { t =>
              var v = 0L
              var i = 0
              while (i < 16) {
                val k = t * 16 + i
                val x = k % 8
                val y = k / 8
                v = v * 2 + (if (avg(x, y) < avg(x + 1, y)) 1L else 0L)
                i += 1
              }
              v: Any
            }
            // exact-duplicate collapse key over the RAW raster bytes in
            // index order: ~124 bits ([[contentDigest]]) — a single
            // 31-bit hash birthday-collides past ~65k images, far below
            // the 100 TB design point, merging distinct images under
            // one representative. Each component stays closed-form
            // recomputable by the SQL oracle (pixel-formula fold).
            bs :+ (contentDigest(px, 0, px.length): Any)
          case _ => Seq[Any](null, null, null, null, null)
        }
        Row.fromSeq(r.toSeq ++ bands)
      }
    }
  }

  /** Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER family, BI_RGB)
    * into a grayscale raster: (width, height, top-down row-major bytes).
    * The same no-codec class as the PGM choice — the container is a
    * fixed-offset header walk plus raw pixel rows, parseable without
    * image libraries. Handles the two BMP-specific layout quirks:
    * rows are padded to 4-byte boundaries, and a POSITIVE biHeight
    * means bottom-up row order (top-down only when biHeight < 0) — the
    * parser normalizes both so downstream consumers (dHash, digests)
    * see the same top-down raster a PGM yields. Grayscale is the
    * integer BT.601 luma (299r + 587g + 114b) / 1000 — exact integer
    * arithmetic, and r=g=b=v maps to v, so a gray BMP and a PGM of the
    * same raster are byte-identical after decode (container-independent
    * digests). Returns None on any malformed/unsupported input: wrong
    * magic, non-BI_RGB compression, bpp != 24, or truncated pixel data.
    */
  def parseBmp(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def i32(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    val off = i32(10)
    val dibSize = i32(14)
    // BITMAPINFOHEADER (40) or its extensions (52/56/108/124): the
    // fields we read sit at the same offsets in all of them
    if (dibSize < 40) return None
    val w = i32(18)
    val hRaw = i32(22)
    val bpp = u16(28)
    val compression = i32(30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0) return None
    // math.abs(Int.MinValue) is still negative — it would slip every
    // size guard below and crash the raster allocation
    if (hRaw == Int.MinValue) return None
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (off < 14 + dibSize || off.toLong + rowSize.toLong * h > b.length)
      return None
    if (w.toLong * h > (1 << 26)) return None // bound decode allocations
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      var x = 0
      val base = off + srcRow * rowSize
      while (x < w) {
        val blue = b(base + x * 3) & 0xff
        val green = b(base + x * 3 + 1) & 0xff
        val red = b(base + x * 3 + 2) & 0xff
        px(y * w + x) = ((299 * red + 587 * green + 114 * blue) / 1000).toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Container-blind raster decode: PGM first (cheap magic check), then
    * BMP — the decode seam's single entry point, so every consumer
    * (dHash bands, raster digests) is container-independent by
    * construction.
    */
  def parseRaster(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parsePgm(b).orElse(parseBmp(b))

  /** Nearest-neighbor raster resize — the REAL scaler the resize stub
    * stands in for on codec formats: destination pixel (x, y) samples
    * source pixel (x * w / ow, y * h / oh) with floor division (the
    * OpenCV INTER_NEAREST convention). Pure integer arithmetic, so the
    * mapping is deterministic and a SQL oracle can recompute it in
    * closed form — a round-vs-floor or x/y-transposition bug moves
    * which source pixels survive and breaks the digest match.
    */
  def resizeRaster(w: Int, h: Int, px: Array[Byte],
      ow: Int, oh: Int): Array[Byte] = {
    require(w > 0 && h > 0 && ow > 0 && oh > 0 && px.length == w * h)
    Array.tabulate(ow * oh) { i =>
      val x = i % ow
      val y = i / ow
      px((y * h / oh) * w + (x * w / ow))
    }
  }

  /** Decode-seam stage for [[resizeRaster]]: parse the raster
    * (container-blind — PGM or BMP), resize to `ow` x `oh`, and append
    * the ~124-bit content digests of the ORIGINAL and the RESIZED
    * raster (`pdigest`, `rdigest`; null when unparseable). One
    * `mapPartitions` pass, same seam discipline as [[dhashBands]].
    */
  def resizeDigests(df: DataFrame, binaryCol: String,
      ow: Int, oh: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("pdigest", StringType, nullable = true),
      StructField("rdigest", StringType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val digests: Seq[Any] =
          parseRaster(r.getAs[Array[Byte]](binIdx)) match {
            case Some((w, h, px)) =>
              val rz = resizeRaster(w, h, px, ow, oh)
              Seq(contentDigest(px, 0, px.length),
                contentDigest(rz, 0, rz.length))
            case None => Seq(null, null)
          }
        Row.fromSeq(r.toSeq ++ digests)
      }
    }
  }

  /** Locate the `mdat` box payload: (offset, length) of the media bytes
    * inside an MP4 payload — the container walk [[mp4DataDigest]] does,
    * exposed for consumers that need the byte RANGE (frame sampling)
    * rather than one digest over it.
    */
  def mp4DataRange(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 16 || beInt(b, 0) < 8) return None
    var i = 0
    while (i + 8 <= b.length) {
      val size = beInt(b, i)
      if (size < 8) return None // 64-bit largesize unsupported here
      val tpe = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tpe == "mdat")
        return if (i.toLong + size <= b.length) Some((i + 8, size - 8))
        else None
      if (i.toLong + size > b.length) return None
      i += size
    }
    None
  }

  /** Decode-seam stage for REAL video frame sampling: walk the MP4 box
    * list to `mdat`, split its media bytes into fixed-size samples
    * ("frames" — the fixture's mdat is a flat sample array, the shape a
    * real stsz/stsc walk would yield), keep every `stride`-th frame
    * starting at 0, and append per-payload accounting: `n_frames`
    * (complete frames in mdat), `n_sampled`, and `sdigest` — a 31-bit
    * fold over the sampled frames' own 31-bit digests in frame order
    * (multiplier 37 outer, 31 inner), so a sampler that slices at the
    * wrong boundary, keeps the wrong phase, or includes a partial tail
    * frame breaks the digest. Nulls when the payload has no complete
    * mdat box. One `mapPartitions` pass, no driver gather.
    */
  def frameSampleDigests(df: DataFrame, binaryCol: String,
      frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", LongType, nullable = true),
      StructField("n_sampled", LongType, nullable = true),
      StructField("sdigest", LongType, nullable = true)))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val P = 2147483647L
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val fields: Seq[Any] = mp4DataRange(payload) match {
          case Some((off, len)) =>
            val nFrames = len / frameSize
            var sdigest = 0L
            var nSampled = 0L
            var k = 0
            while (k < nFrames) {
              var fd = 0L
              var i = off + k * frameSize
              val end = i + frameSize
              while (i < end) {
                fd = (fd * 31 + (payload(i) & 0xff)) % P
                i += 1
              }
              sdigest = (sdigest * 37 + fd) % P
              nSampled += 1
              k += stride
            }
            Seq(nFrames.toLong, nSampled, sdigest)
          case None => Seq(null, null, null)
        }
        Row.fromSeq(r.toSeq ++ fields)
      }
    }
  }

  /** Uncompressed 24-bit gray BMP (r=g=b) with the given top-down
    * raster; `topDown = false` stores rows bottom-up with positive
    * biHeight (the canonical layout), `true` stores them top-down with
    * negative biHeight. Row stride pads to 4 bytes.
    */
  def bmpBytes(w: Int, h: Int, px: Array[Byte],
      topDown: Boolean = false): Array[Byte] = {
    require(px.length == w * h)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val out = java.nio.ByteBuffer.allocate(54 + rowSize * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + rowSize * h) // file size
    out.putInt(0)                // reserved
    out.putInt(54)               // pixel data offset
    out.putInt(40)               // BITMAPINFOHEADER
    out.putInt(w)
    out.putInt(if (topDown) -h else h)
    out.putShort(1)              // planes
    out.putShort(24)             // bpp
    out.putInt(0)                // BI_RGB
    out.putInt(rowSize * h)      // image size
    out.putInt(2835).putInt(2835) // 72 DPI
    out.putInt(0).putInt(0)      // palette
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base = 54 + y * rowSize
      var x = 0
      while (x < w) {
        val v = px(srcRow * w + x)
        out.put(base + x * 3, v).put(base + x * 3 + 1, v)
          .put(base + x * 3 + 2, v)
        x += 1
      }
      y += 1
    }
    out.array()
  }

  /** PGM P5 container with the given raster. */
  def pgmBytes(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(px.length == w * h)
    val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + px.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(px, 0, out, header.length, px.length)
    out
  }

  // ---- deterministic container builders (tests + oracle fixtures) ----

  /** Minimal well-formed PNG header (signature + IHDR) with the given
    * dimensions; body truncated — enough for any header parser.
    */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(26)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.putInt(13) // IHDR payload length
    out.put(Array[Byte]('I', 'H', 'D', 'R'))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte) // bit depth, color type
    out.array()
  }

  /** Minimal JPEG: SOI, APP0 stub, SOF0 frame header with dimensions. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 4 + 2 + 9)
    out.put(0xff.toByte).put(0xd8.toByte)            // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(2) // APP0, empty
    out.put(0xff.toByte).put(0xc0.toByte)            // SOF0
    out.putShort(9)                                   // segment length
    out.put(8.toByte)                                 // precision
    out.putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte)                                 // 1 component
    out.array()
  }

  /** Minimal GIF89a logical screen descriptor. */
  def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  /** The shared content-digest: four independent rolling hashes over a
    * byte range (multipliers 31/37/41/43, each mod the Mersenne prime),
    * joined ':' into a ~124-bit string key — the same collision story as
    * the image pdigest, and each component stays closed-form
    * recomputable by a SQL oracle folding the planted byte formula.
    */
  def contentDigest(b: Array[Byte], from: Int, len: Int): String = {
    val P = 2147483647L
    val hs = Array(0L, 0L, 0L, 0L)
    var i = from
    val end = from + len
    while (i < end) {
      val v = b(i) & 0xff
      hs(0) = (hs(0) * 31 + v) % P
      hs(1) = (hs(1) * 37 + v) % P
      hs(2) = (hs(2) * 41 + v) % P
      hs(3) = (hs(3) * 43 + v) % P
      i += 1
    }
    hs.mkString(":")
  }

  /** Exact-duplicate digest of a WAV's AUDIO CONTENT: walk the RIFF
    * subchunk list to the `data` subchunk and digest its PCM payload
    * bytes — container-aware identity, so re-wrapped audio (extra JUNK
    * chunks, different chunk order) collapses with its original while a
    * single changed sample does not. None when the payload is not a
    * well-formed WAV or the data subchunk is truncated.
    */
  def wavDataDigest(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 12 || b(0) != 'R' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
        b(10) != 'V' || b(11) != 'E') return None
    var i = 12L
    while (i + 8 <= b.length) {
      val j = i.toInt
      val size = leInt(b, j + 4)
      if (size < 0) return None
      if (b(j) == 'd' && b(j + 1) == 'a' && b(j + 2) == 't' && b(j + 3) == 'a')
        return if (j + 8L + size <= b.length)
          Some(contentDigest(b, j + 8, size))
        else None
      i += 8L + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Exact-duplicate digest of an MP4's MEDIA CONTENT: walk the
    * top-level box list to `mdat` and digest its payload bytes — the
    * analog of [[wavDataDigest]] for the video container (moov metadata
    * edits don't change identity; a changed media byte does). None when
    * the payload is not a well-formed MP4 or has no complete mdat box.
    */
  def mp4DataDigest(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 16 || beInt(b, 0) < 8) return None
    var i = 0
    while (i + 8 <= b.length) {
      val size = beInt(b, i)
      if (size < 8) return None // 64-bit largesize unsupported here
      val tpe = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tpe == "mdat")
        return if (i.toLong + size <= b.length)
          Some(contentDigest(b, i + 8, size - 8))
        else None
      if (i.toLong + size > b.length) return None
      i += size
    }
    None
  }

  /** Append audio + video content digests (`adigest`, `vdigest`,
    * nullable strings) for two binary columns in ONE `mapPartitions`
    * pass — the decode-seam stage the staged multimodal curation's
    * audio/video elections key on. Same seam discipline as
    * [[dhashBands]]: per-task batch work, no driver gather, no UDF
    * registry.
    */
  def avDigests(df: DataFrame, audioCol: String,
      videoCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("adigest", StringType, nullable = true),
      StructField("vdigest", StringType, nullable = true)))
    val aIdx = df.schema.fieldIndex(audioCol)
    val vIdx = df.schema.fieldIndex(videoCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val ad = wavDataDigest(r.getAs[Array[Byte]](aIdx)).orNull
        val vd = mp4DataDigest(r.getAs[Array[Byte]](vIdx)).orNull
        Row.fromSeq(r.toSeq ++ Seq(ad, vd))
      }
    }
  }

  /** Minimal WAV: RIFF/WAVE header with a junk chunk BEFORE `fmt ` (so a
    * parser that assumes fmt-first fails) and an empty data chunk.
    */
  def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = java.nio.ByteBuffer.allocate(12 + 12 + 24 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ascii)).putInt(48).put("WAVE".getBytes(ascii))
    out.put("JUNK".getBytes(ascii)).putInt(4).putInt(0)
    out.put("fmt ".getBytes(ascii)).putInt(16)
    out.putShort(1)                   // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort)  // block align
    out.putShort(16)                  // bits per sample
    out.put("data".getBytes(ascii)).putInt(0)
    out.array()
  }

  /** WAV with PCM content: the [[wavBytes]] layout (junk chunk before
    * `fmt `) plus a `data` subchunk carrying `data` — the fixture the
    * audio-digest seam walks (digest identity = these bytes exactly).
    */
  def wavBytes(sampleRate: Int, channels: Int,
      data: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val pad = data.length & 1 // RIFF chunks are word-aligned
    val out = java.nio.ByteBuffer.allocate(12 + 12 + 24 + 8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ascii)).putInt(36 + 12 + data.length + pad)
      .put("WAVE".getBytes(ascii))
    out.put("JUNK".getBytes(ascii)).putInt(4).putInt(0)
    out.put("fmt ".getBytes(ascii)).putInt(16)
    out.putShort(1)                   // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort)  // block align
    out.putShort(16)                  // bits per sample
    out.put("data".getBytes(ascii)).putInt(data.length).put(data)
    out.array()
  }

  /** MP4 with media content: the [[mp4Bytes]] layout plus a trailing
    * `mdat` box carrying `mdat` — the fixture the video-digest seam
    * walks (digest identity = these bytes exactly).
    */
  def mp4Bytes(w: Int, h: Int, mdat: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val base = mp4Bytes(w, h)
    val out = java.nio.ByteBuffer.allocate(base.length + 8 + mdat.length)
    out.put(base)
    out.putInt(8 + mdat.length).put("mdat".getBytes(ascii)).put(mdat)
    out.array()
  }

  /** Minimal MP4: ftyp box, then moov/trak/tkhd (version 0) carrying the
    * 16.16 fixed-point track dimensions.
    */
  def mp4Bytes(w: Int, h: Int): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val tkhdPayload = 84 // version/flags(4) + v0 fields(72) + w(4) + h(4)
    val tkhdSize = 8 + tkhdPayload
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + trakSize
    val out = java.nio.ByteBuffer.allocate(16 + moovSize)
    out.putInt(16).put("ftyp".getBytes(ascii))
      .put("isom".getBytes(ascii)).putInt(512)
    out.putInt(moovSize).put("moov".getBytes(ascii))
    out.putInt(trakSize).put("trak".getBytes(ascii))
    out.putInt(tkhdSize).put("tkhd".getBytes(ascii))
    out.putInt(0)                     // version 0 + flags
    out.putInt(0).putInt(0)           // ctime, mtime
    out.putInt(1).putInt(0).putInt(0) // track id, reserved, duration
    out.putInt(0).putInt(0)           // reserved(8)
    out.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/reserved
    (0 until 9).foreach(i => out.putInt(if (i % 4 == 0 && i < 8) 0x00010000 else 0)) // unity matrix
    out.putInt(w << 16).putInt(h << 16)
    out.array()
  }
}
