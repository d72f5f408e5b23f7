package graft.spark

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-chunk min/max/null-count statistics.
  *
  * The reference format has no footer or index, so its chunk skipping is
  * evaluate-then-skip (decode the filter columns, drop the chunk if no
  * row matches — src/columnfile-select.cc:90-176). This sidecar index is
  * the scale extension SURVEY.md §4 calls out: Parquet-row-group-style
  * min/max pruning, evaluated on the DRIVER during partition planning, so
  * provably-empty chunks never even become task work. At 100 TB with a
  * selective predicate over sorted data this is the difference between
  * scheduling a handful of tasks and scheduling tens of thousands.
  *
  * Values are normalized to three total orders: integer family (ints,
  * date days, timestamp micros, booleans) as Long, float family as
  * Double, strings as String. Binary/nested columns carry no stats.
  */
object ChunkStatsIndex {

  val Suffix = ".stats.json"

  /** One column's accumulated stats within one chunk. */
  final class ColAcc(val dataType: DataType) {
    var nulls: Long = 0L
    var loL: Long = Long.MaxValue
    var hiL: Long = Long.MinValue
    var loD: Double = Double.PositiveInfinity
    var hiD: Double = Double.NegativeInfinity
    var loS: String = null
    var hiS: String = null
    var seen: Boolean = false
    var hasNaN: Boolean = false
    // exact non-null sum for PURE integral types (SUM pushdown). Kept
    // only while it stays in-range: an overflowing chunk drops its sum
    // key and SUM falls back to the real scan, whose wrap matches
    // Spark's non-ANSI semantics anyway. Floats are excluded on
    // principle — their sum is order-dependent, so a stats-computed
    // value could differ bitwise from the scan's.
    var sum: Long = 0L
    var sumOverflow: Boolean = false
    val sumCapable: Boolean = dataType match {
      case IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    }
  }

  /** Spark compares strings by UTF-8 byte order (code points), which
    * diverges from Java's UTF-16 `String.compareTo` for supplementary
    * characters vs U+E000..U+FFFF. All stats ordering goes through this
    * so pruning and MIN/MAX pushdown match engine semantics.
    */
  def utf8Cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  sealed trait Range
  final case class LongRange(lo: Long, hi: Long) extends Range
  final case class DoubleRange(lo: Double, hi: Double) extends Range
  final case class StringRange(lo: String, hi: String) extends Range

  /** Per-chunk per-column Bloom filter over the column's non-null values
    * (normalized exactly like the range stats: integer family as Long,
    * strings as UTF-8). Point-lookup pruning for the case min/max can't
    * touch: a high-cardinality UNSORTED column (ids, digests, urls),
    * where every chunk's range spans the whole domain so `provesEmpty`
    * never fires on EqualTo/In — the dominant needle-query shape at
    * 100 TB. Opt-in per column (write option `bloom=col,col`), the
    * Parquet column-bloom analog.
    *
    * Sound by construction: built from EVERY non-null value of the
    * chunk, so `mightContain == false` proves the value absent; a false
    * positive merely fails to prune. Double family is excluded (float
    * equality pruning isn't worth the bytes).
    */
  final case class Bloom(k: Int, bits: Array[Long]) {
    private def nbits: Long = bits.length.toLong * 64L
    def mightContain(base: Long): Boolean = {
      val h1 = fmix64(base)
      val h2 = fmix64(base ^ 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < k) {
        val idx = ((h1 + i * h2) & Long.MaxValue) % nbits
        if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
        i += 1
      }
      true
    }
    private[ChunkStatsIndex] def set(base: Long): Unit = {
      val h1 = fmix64(base)
      val h2 = fmix64(base ^ 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < k) {
        val idx = ((h1 + i * h2) & Long.MaxValue) % nbits
        bits((idx >>> 6).toInt) |= 1L << (idx & 63L)
        i += 1
      }
    }
  }

  /** 64-bit avalanche (MurmurHash3 finalizer — public constant mix). */
  private def fmix64(v: Long): Long = {
    var z = v
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  /** Base hash of a normalized long-family value. */
  def baseHashLong(v: Long): Long = fmix64(v)

  /** Base hash of a string value: FNV-1a 64 over its UTF-8 bytes, then
    * avalanched (FNV alone clusters on short ASCII).
    */
  def baseHashString(s: String): Long = {
    val bytes = UTF8String.fromString(s).getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    fmix64(h)
  }

  /** Bloom sizing: ~10 bits per distinct key, capped at 1 Mi bits
    * (128 KiB → ~171 KB of sidecar base64 per column per chunk, ~1% of
    * a 16 MiB chunk — the Parquet-bloom cost ballpark; 10 bits/key to
    * ~105k distinct, degrading to the 4 bits/key floor at ~262k). Below
    * 4 bits/key the false-positive rate makes the filter dead weight —
    * emit nothing instead.
    */
  private val MaxBloomBits = 1L << 20
  private[spark] def buildBloom(distinctBases: Array[Long]): Option[Bloom] = {
    val n = distinctBases.length
    if (n == 0) return None
    val want = n.toLong * 10L
    val m = math.min(math.max(512L, (want + 511L) / 512L * 512L), MaxBloomBits)
    if (m / n < 4) return None
    val k = math.max(1L, math.min(8L, math.round(0.69 * m / n))).toInt
    val b = Bloom(k, new Array[Long]((m / 64L).toInt))
    distinctBases.foreach(b.set)
    Some(b)
  }

  /** (rows, per-leaf (range, nulls)); leaves keyed by flatten() ordinal.
    * `off`/`bytes` locate the chunk inside the data file (header offset /
    * column-block byte size) — when present, the driver plans partitions
    * from the sidecar alone, without ever opening the data file. -1 in
    * sidecars written before offsets existed.
    */
  final case class ChunkStats(
      rows: Long,
      cols: Map[Int, (Option[Range], Long)],
      off: Long = -1L,
      bytes: Long = -1L,
      sums: Map[Int, Long] = Map.empty,
      blooms: Map[Int, Bloom] = Map.empty)
    extends Serializable

  /** Which leaf types carry stats, and the normalized family. Decimals
    * up to 18 digits ride the long family as unscaled values — every
    * value in a column shares the column's scale, so unscaled order is
    * value order. Wider decimals carry no stats (safe fallback).
    */
  /** Whether a leaf of this type carries (min, max) range stats — the
    * precondition for a write-side `sortedBy` stamp on the column to be
    * read-side provable at all. */
  private[graft] def statsCapable(dt: DataType): Boolean =
    family(dt).isDefined

  private def family(dt: DataType): Option[Char] = dt match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | BooleanType => Some('l')
    case d: DecimalType if d.precision <= 18 => Some('l')
    case DoubleType | FloatType => Some('d')
    case StringType => Some('s')
    case _ => None
  }

  /** Hashes kept past this count drop the chunk's bloom instead of
    * growing without bound (a chunk that large gets no useful filter at
    * the bit cap anyway).
    */
  private val MaxBloomHashes = 1 << 22

  /** Accumulator for one chunk across all leaves of the write schema.
    * `bloomCols`: leaf ordinals (long/string family only) whose non-null
    * values additionally feed a per-chunk [[Bloom]].
    */
  final class Collector(leaves: IndexedSeq[CellCodec.Leaf],
      bloomCols: Set[Int] = Set.empty) {
    private var rows = 0L
    private var accs: Array[ColAcc] =
      leaves.map(l => new ColAcc(l.dataType)).toArray
    // growable primitive buffers of base hashes, one per bloom column;
    // deduped + sized at finishChunk (distinct count drives bloom bits)
    private def freshHashes(): Map[Int, HashBuf] =
      bloomCols.iterator
        .filter(i => family(leaves(i).dataType).exists(f => f == 'l' || f == 's'))
        .map(i => i -> new HashBuf).toMap
    private var bloomBufs: Map[Int, HashBuf] = freshHashes()

    def observe(cells: Array[Array[Byte]]): Unit = {
      rows += 1
      var i = 0
      while (i < cells.length) {
        val acc = accs(i)
        val cell = cells(i)
        if (cell == null) acc.nulls += 1
        else {
          // presence is tracked for EVERY type (so COUNT(col) pushdown can
          // distinguish "no nulls" from "column absent in this chunk");
          // ranges only for the stats families below.
          acc.seen = true
          family(acc.dataType).foreach { fam =>
          fam match {
            case 'l' =>
              val v = acc.dataType match {
                case LongType | TimestampType | TimestampNTZType =>
                  CellCodec.decode(acc.dataType, cell).asInstanceOf[Long]
                case IntegerType | DateType =>
                  CellCodec.decode(acc.dataType, cell).asInstanceOf[Int].toLong
                case ShortType =>
                  CellCodec.decode(acc.dataType, cell).asInstanceOf[Short].toLong
                case ByteType =>
                  CellCodec.decode(acc.dataType, cell).asInstanceOf[Byte].toLong
                case BooleanType =>
                  if (CellCodec.decode(acc.dataType, cell).asInstanceOf[Boolean]) 1L else 0L
                case _: DecimalType =>
                  CellCodec.decode(acc.dataType, cell)
                    .asInstanceOf[org.apache.spark.sql.types.Decimal].toUnscaledLong
                case _ => 0L
              }
              if (v < acc.loL) acc.loL = v
              if (v > acc.hiL) acc.hiL = v
              if (acc.sumCapable && !acc.sumOverflow) {
                try acc.sum = Math.addExact(acc.sum, v)
                catch { case _: ArithmeticException => acc.sumOverflow = true }
              }
              bloomBufs.get(i).foreach(_.add(baseHashLong(v)))
            case 'd' =>
              val raw = acc.dataType match {
                case DoubleType => CellCodec.decode(acc.dataType, cell).asInstanceOf[Double]
                case FloatType  => CellCodec.decode(acc.dataType, cell).asInstanceOf[Float].toDouble
                case _          => 0.0
              }
              if (raw.isNaN) acc.hasNaN = true
              else {
                // -0.0 == 0.0 in the engine; normalize so a [-0.0] chunk
                // isn't pruned for `x = 0.0`.
                val v = if (raw == 0.0) 0.0 else raw
                if (v < acc.loD) acc.loD = v
                if (v > acc.hiD) acc.hiD = v
              }
            case 's' =>
              val v = UTF8String.fromBytes(cell).toString
              if (acc.loS == null || utf8Cmp(v, acc.loS) < 0) acc.loS = v
              if (acc.hiS == null || utf8Cmp(v, acc.hiS) > 0) acc.hiS = v
              bloomBufs.get(i).foreach(_.add(baseHashString(v)))
          }
          }
        }
        i += 1
      }
    }

    /** Snapshot the current chunk's stats and reset for the next chunk. */
    def finishChunk(): ChunkStats = {
      val cols = accs.zipWithIndex.flatMap { case (a, i) =>
        if (!a.seen && a.nulls == 0) None
        else {
          val range: Option[Range] =
            if (!a.seen) None
            else family(a.dataType).flatMap {
              case 'l' => Some(LongRange(a.loL, a.hiL))
              // NaN is unordered in IEEE but GREATEST in the engine's total
              // order: a chunk containing NaN gets no range at all (the
              // Parquet convention), so it is never pruned and MIN/MAX
              // pushdown bails instead of answering without the NaN.
              case 'd' => if (a.hasNaN || a.loD.isInfinite && a.hiD.isInfinite && a.loD > a.hiD)
                            None
                          else Some(DoubleRange(a.loD, a.hiD))
              case 's' => Some(StringRange(a.loS, a.hiS))
            }
          Some(i -> (range, a.nulls))
        }
      }.toMap
      val sums = accs.zipWithIndex.collect {
        case (a, i) if a.seen && a.sumCapable && !a.sumOverflow => i -> a.sum
      }.toMap
      val blooms = bloomBufs.flatMap { case (i, buf) =>
        buf.distinctOrNone().flatMap(buildBloom).map(i -> _)
      }
      val out = ChunkStats(rows, cols, sums = sums, blooms = blooms)
      rows = 0L
      accs = accs.map(a => new ColAcc(a.dataType))
      bloomBufs = freshHashes()
      out
    }

    def hasRows: Boolean = rows > 0
  }

  /** Growable primitive buffer of base hashes for one bloom column.
    * No per-value boxing, no per-value set lookup: values append raw and
    * dedupe once at chunk end via sort (distinct count drives sizing).
    */
  private final class HashBuf {
    private var arr = new Array[Long](1024)
    private var n = 0
    private var overflowed = false
    def add(h: Long): Unit = {
      if (overflowed) return
      if (n == arr.length) {
        if (n >= MaxBloomHashes) { overflowed = true; arr = null; return }
        arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      }
      arr(n) = h
      n += 1
    }
    /** Sorted-distinct hashes, or None when the chunk overflowed the
      * hash cap (no bloom rather than an unbounded buffer).
      */
    def distinctOrNone(): Option[Array[Long]] = {
      if (overflowed) return None
      if (n == 0) return Some(Array.empty[Long])
      java.util.Arrays.sort(arr, 0, n)
      var distinct = 1
      var i = 1
      while (i < n) {
        if (arr(i) != arr(i - 1)) { arr(distinct) = arr(i); distinct += 1 }
        i += 1
      }
      Some(java.util.Arrays.copyOf(arr, distinct))
    }
  }

  // ---- JSON (hand-rolled: flat, typed, no deps beyond stdlib) ----

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def toJson(chunks: Seq[ChunkStats]): String = toJson(-1L, chunks)

  /** Object form `{"len":fileLen,"chunks":[…]}` when fileLen >= 0 — the
    * planner uses `len` as a cheap staleness check (sidecar vs listed
    * file length) before trusting chunk offsets; bare array otherwise.
    */
  def toJson(fileLen: Long, chunks: Seq[ChunkStats]): String = {
    val arr = chunks.map { c =>
      val cols = c.cols.toSeq.sortBy(_._1).map { case (i, (r, nulls)) =>
        val range = r match {
          case Some(LongRange(lo, hi))   => s""""t":"l","lo":$lo,"hi":$hi"""
          case Some(DoubleRange(lo, hi)) =>
            if (lo.isInfinite || hi.isInfinite || lo.isNaN || hi.isNaN) """"t":"n""""
            else s""""t":"d","lo":$lo,"hi":$hi"""
          case Some(StringRange(lo, hi)) =>
            s""""t":"s","lo":"${esc(lo)}","hi":"${esc(hi)}""""
          case None => """"t":"n""""
        }
        val sum = c.sums.get(i).map(s => s""","sum":$s""").getOrElse("")
        // base64 alphabet needs no JSON escaping
        val bloom = c.blooms.get(i).map(b =>
          s""","bk":${b.k},"bf":"${bloomToB64(b.bits)}"""").getOrElse("")
        s""""$i":{$range,"nulls":${nulls}$sum$bloom}"""
      }.mkString("{", ",", "}")
      val loc = if (c.off >= 0) s""""off":${c.off},"bytes":${c.bytes},""" else ""
      s"""{${loc}"rows":${c.rows},"cols":$cols}"""
    }.mkString("[", ",", "]")
    if (fileLen < 0) arr else s"""{"len":$fileLen,"chunks":$arr}"""
  }

  private def bloomToB64(bits: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  private def bloomFromB64(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  /** Tiny recursive-descent parser for exactly the JSON toJson emits. */
  def fromJson(s: String): Seq[ChunkStats] = fromJsonWithLen(s)._2

  /** (fileLen, chunks); fileLen = -1 for legacy bare-array sidecars. */
  def fromJsonWithLen(s: String): (Long, Seq[ChunkStats]) = {
    val p = new P(s)
    p.ws()
    var fileLen = -1L
    if (p.peek == '{') {
      p.expect('{')
      var chunks: Seq[ChunkStats] = Seq.empty
      var more = true
      while (more) {
        p.ws()
        val key = p.string()
        p.ws(); p.expect(':')
        key match {
          case "len"    => fileLen = p.long()
          case "chunks" => chunks = parseChunkArray(p)
          case other => throw new IllegalArgumentException(s"stats: unknown key $other")
        }
        p.ws()
        if (p.peek == ',') { p.next(); () } else more = false
      }
      p.expect('}')
      (fileLen, chunks)
    } else (fileLen, parseChunkArray(p))
  }

  private def parseChunkArray(p: P): Seq[ChunkStats] = {
    p.ws(); p.expect('[')
    val out = mutable.ArrayBuffer.empty[ChunkStats]
    p.ws()
    if (p.peek != ']') {
      var more = true
      while (more) {
        out += parseChunk(p)
        p.ws()
        if (p.peek == ',') { p.next(); () } else more = false
      }
    }
    p.expect(']')
    out.toSeq
  }

  private def parseChunk(p: P): ChunkStats = {
    p.ws(); p.expect('{')
    var rows = 0L
    var off = -1L
    var bytes = -1L
    var cols = Map.empty[Int, (Option[Range], Long)]
    var sums = Map.empty[Int, Long]
    var blooms = Map.empty[Int, Bloom]
    var more = true
    while (more) {
      p.ws()
      val key = p.string()
      p.ws(); p.expect(':')
      key match {
        case "rows"  => rows = p.long()
        case "off"   => off = p.long()
        case "bytes" => bytes = p.long()
        case "cols" =>
          p.ws(); p.expect('{'); p.ws()
          if (p.peek != '}') {
            var m2 = true
            while (m2) {
              p.ws()
              val idx = p.string().toInt
              p.ws(); p.expect(':')
              val (r, n, sumOpt, bloomOpt) = parseCol(p)
              cols += idx -> (r, n)
              sumOpt.foreach(s => sums += idx -> s)
              bloomOpt.foreach(b => blooms += idx -> b)
              p.ws()
              if (p.peek == ',') { p.next(); () } else m2 = false
            }
          }
          p.expect('}')
        case _ => throw new IllegalArgumentException(s"stats: unknown key $key")
      }
      p.ws()
      if (p.peek == ',') { p.next(); () } else more = false
    }
    p.expect('}')
    ChunkStats(rows, cols, off, bytes, sums, blooms)
  }

  private def parseCol(p: P): (Option[Range], Long, Option[Long], Option[Bloom]) = {
    p.ws(); p.expect('{')
    var t = 'n'; var loL = 0L; var hiL = 0L; var loD = 0.0; var hiD = 0.0
    var loS = ""; var hiS = ""; var nulls = 0L
    var loStr = ""; var hiStr = ""
    var sum: Option[Long] = scala.None
    var bloomK = 0
    var bloomBits: Array[Long] = null
    var more = true
    while (more) {
      p.ws()
      val key = p.string()
      p.ws(); p.expect(':')
      key match {
        case "t"     => t = p.string().head
        case "nulls" => nulls = p.long()
        case "sum"   => sum = Some(p.long())
        case "bk"    => bloomK = p.long().toInt
        case "bf"    => bloomBits = bloomFromB64(p.string())
        case "lo" => t match {
          case 's' => loS = p.string()
          case _   => loStr = p.numberToken()
        }
        case "hi" => t match {
          case 's' => hiS = p.string()
          case _   => hiStr = p.numberToken()
        }
        case _ => throw new IllegalArgumentException(s"stats: unknown key $key")
      }
      p.ws()
      if (p.peek == ',') { p.next(); () } else more = false
    }
    p.expect('}')
    val range = t match {
      case 'l' => Some(LongRange(loStr.toLong, hiStr.toLong))
      case 'd' => Some(DoubleRange(loStr.toDouble, hiStr.toDouble))
      case 's' => Some(StringRange(loS, hiS))
      case _   => None
    }
    val bloom =
      if (bloomBits != null && bloomBits.nonEmpty && bloomK >= 1 && bloomK <= 8)
        Some(Bloom(bloomK, bloomBits))
      else scala.None
    (range, nulls, sum, bloom)
  }

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def peek: Char = if (i < s.length) s.charAt(i) else ' '
    def next(): Char = { val c = s.charAt(i); i += 1; c }
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"stats: expected '$c' at $i")
      i += 1
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = next()
        if (c == '\\') next() match {
          case '"' => sb += '"'; case '\\' => sb += '\\'; case 'n' => sb += '\n'
          case 'r' => sb += '\r'; case 't' => sb += '\t'
          case 'u' => sb += Integer.parseInt(s.substring(i, i + 4), 16).toChar; i += 4
          case o   => sb += o
        } else sb += c
      }
      i += 1
      sb.toString
    }
    def numberToken(): String = {
      ws()
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i)
    }
    def long(): Long = numberToken().toLong
  }

  // ---- IO ----

  def write(conf: Configuration, dataFile: Path, chunks: Seq[ChunkStats],
            fileLen: Long = -1L): Unit = {
    val fs = dataFile.getFileSystem(conf)
    val p = new Path(dataFile.getParent, "." + dataFile.getName + Suffix)
    val out = fs.create(p, true)
    try out.write(toJson(fileLen, chunks)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // drop any cached parse for this sidecar: the (mtime, len) key
    // self-invalidates across processes, but an in-process rewrite
    // within one mtime granule to the same length would alias
    invalidate(fs.makeQualified(p))
  }

  /** Drop cached parses for `sidecarPath` (any mtime/len vintage). */
  private[spark] def invalidate(sidecarPath: Path): Unit = {
    val s = sidecarPath.toString
    sidecarCache.synchronized {
      val it = sidecarCache.keySet().iterator()
      while (it.hasNext) if (it.next()._1 == s) it.remove()
    }
  }

  def read(conf: Configuration, dataFile: Path): Option[Seq[ChunkStats]] =
    readWithLen(conf, dataFile).map(_._2)

  /** Process-wide parsed-sidecar cache, keyed by (sidecar path, mtime,
    * length) — the Spark file-listing-cache discipline applied to our
    * stats sidecars: every Scan instance of every query re-reads one
    * tiny JSON per data file during planning, and a query that
    * references a 100-file cell-partitioned table from several scans
    * paid hundreds of open+parse round-trips per run. The mtime+len
    * key self-invalidates on any rewrite (writers always replace the
    * sidecar with the data file); a deleted sidecar misses on the stat.
    * Entries are immutable after parse. Bounded LRU (access order);
    * size via SPARK_GRAFT_SIDECAR_CACHE (0 disables).
    */
  private val sidecarCacheMax: Int =
    try sys.env.getOrElse("SPARK_GRAFT_SIDECAR_CACHE", "4096").toInt
    catch { case _: NumberFormatException => 4096 }
  private val sidecarCache =
    new java.util.LinkedHashMap[(String, Long, Long), Option[(Long, Seq[ChunkStats])]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), Option[(Long, Seq[ChunkStats])]])
          : Boolean = size() > sidecarCacheMax
    }

  /** (recorded fileLen, chunks); fileLen -1 when the sidecar predates
    * offsets. Callers trust chunk offsets only when fileLen matches the
    * listed file's length (cheap staleness guard, no data-file open).
    */
  def readWithLen(conf: Configuration, dataFile: Path): Option[(Long, Seq[ChunkStats])] = {
    val fs = dataFile.getFileSystem(conf)
    val p = new Path(dataFile.getParent, "." + dataFile.getName + Suffix)
    val st = try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => null }
    if (st == null) None
    else {
      // st.getPath is the QUALIFIED path — the same spelling
      // invalidate() uses, so writer-driven eviction always matches
      val key = (st.getPath.toString, st.getModificationTime, st.getLen)
      if (sidecarCacheMax > 0) {
        val hit = sidecarCache.synchronized(sidecarCache.get(key))
        if (hit != null) return hit
      }
      val in = fs.open(p)
      val parsed =
        try Some(fromJsonWithLen(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)))
        catch { case _: Exception => None } // corrupt stats: just don't prune
        finally in.close()
      if (sidecarCacheMax > 0)
        sidecarCache.synchronized(sidecarCache.put(key, parsed))
      parsed
    }
  }

  // ---- pruning ----

  /** Normalize a pushdown literal into the column's stats family. */
  private[spark] def lit(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (IntegerType, x: java.lang.Integer) => Some(x.longValue())
    case (LongType, x: java.lang.Long)       => Some(x.longValue())
    case (LongType, x: java.lang.Integer)    => Some(x.longValue())
    case (ShortType, x: java.lang.Short)     => Some(x.longValue())
    case (ByteType, x: java.lang.Byte)       => Some(x.longValue())
    case (BooleanType, x: java.lang.Boolean) => Some(if (x) 1L else 0L)
    case (DateType, x: java.sql.Date)        => Some(DateTimeUtils.fromJavaDate(x).toLong)
    case (DateType, x: java.time.LocalDate)  => Some(DateTimeUtils.localDateToDays(x).toLong)
    case (TimestampType, x: java.sql.Timestamp) => Some(DateTimeUtils.fromJavaTimestamp(x))
    case (TimestampType, x: java.time.Instant)  => Some(DateTimeUtils.instantToMicros(x))
    case (DoubleType, x: java.lang.Double)   =>
      val d = x.doubleValue(); Some(if (d == 0.0) 0.0 else d)
    case (FloatType, x: java.lang.Float)     =>
      val d = x.floatValue().toDouble; Some(if (d == 0.0) 0.0 else d)
    case (StringType, x: String)             => Some(x)
    case (StringType, x: UTF8String)         => Some(x.toString)
    case (d: DecimalType, x: java.math.BigDecimal) if d.precision <= 18 =>
      // rescale exactly or refuse (a literal needing rounding can't be
      // compared against unscaled ranges soundly)
      try Some(x.setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
        .unscaledValue().longValueExact())
      catch { case _: ArithmeticException => None }
    case (d: DecimalType, x: org.apache.spark.sql.types.Decimal) if d.precision <= 18 =>
      try Some(x.toJavaBigDecimal.setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
        .unscaledValue().longValueExact())
      catch { case _: ArithmeticException => None }
    case _ => None
  }

  private def cmp(range: Range, v: Any): Option[(Int, Int)] = (range, v) match {
    // returns (sign(lo compare v), sign(hi compare v)); doubles via
    // java.lang.Double.compare = the engine's total order (NaN greatest),
    // strings via UTF-8 byte order = the engine's string order.
    case (LongRange(lo, hi), x: Long)     => Some((lo.compare(x), hi.compare(x)))
    case (DoubleRange(lo, hi), x: Double) => Some((lo.compare(x), hi.compare(x)))
    case (StringRange(lo, hi), x: String) => Some((utf8Cmp(lo, x).sign, utf8Cmp(hi, x).sign))
    case _ => None
  }

  /** True iff `filter` provably matches no row of a chunk with `stats`.
    * Conservative: anything unknown returns false (don't prune).
    */
  def provesEmpty(
      filter: Filter,
      stats: ChunkStats,
      leafIndex: Map[String, Int],
      leafType: Map[String, DataType]): Boolean = {

    def colInfo(attr: String): Option[(Option[Range], Long)] =
      leafIndex.get(attr).flatMap(stats.cols.get)

    def allNull(attr: String): Boolean =
      colInfo(attr).exists { case (r, nulls) => r.isEmpty && nulls == stats.rows }

    def rangeCmp(attr: String, v: Any): Option[(Int, Int)] =
      for {
        dt <- leafType.get(attr)
        l <- lit(dt, v)
        (rOpt, _) <- colInfo(attr)
        r <- rOpt
        c <- cmp(r, l)
      } yield c

    /** True iff the column's bloom PROVES the literal absent from the
      * chunk. The bloom covers every non-null value, so a definite miss
      * is a sound prune for equality; any uncertainty (no bloom, no
      * normalizable literal, double family) returns false.
      */
    def bloomRejects(attr: String, v: Any): Boolean =
      (for {
        dt <- leafType.get(attr)
        l <- lit(dt, v)
        idx <- leafIndex.get(attr)
        b <- stats.blooms.get(idx)
      } yield l match {
        case x: Long   => !b.mightContain(baseHashLong(x))
        case s: String => !b.mightContain(baseHashString(s))
        case _         => false
      }).getOrElse(false)

    filter match {
      case And(l, r) =>
        provesEmpty(l, stats, leafIndex, leafType) ||
          provesEmpty(r, stats, leafIndex, leafType)
      case Or(l, r) =>
        provesEmpty(l, stats, leafIndex, leafType) &&
          provesEmpty(r, stats, leafIndex, leafType)
      case EqualTo(a, v) =>
        allNull(a) || rangeCmp(a, v).exists { case (lo, hi) => lo > 0 || hi < 0 } ||
          bloomRejects(a, v)
      case EqualNullSafe(a, v) if v != null =>
        allNull(a) || rangeCmp(a, v).exists { case (lo, hi) => lo > 0 || hi < 0 } ||
          bloomRejects(a, v)
      case GreaterThan(a, v) =>
        allNull(a) || rangeCmp(a, v).exists { case (_, hi) => hi <= 0 }
      case GreaterThanOrEqual(a, v) =>
        allNull(a) || rangeCmp(a, v).exists { case (_, hi) => hi < 0 }
      case LessThan(a, v) =>
        allNull(a) || rangeCmp(a, v).exists { case (lo, _) => lo >= 0 }
      case LessThanOrEqual(a, v) =>
        allNull(a) || rangeCmp(a, v).exists { case (lo, _) => lo > 0 }
      case In(a, vs) =>
        allNull(a) || (vs.nonEmpty && vs.forall(v =>
          rangeCmp(a, v).exists { case (lo, hi) => lo > 0 || hi < 0 } ||
            bloomRejects(a, v)))
      case IsNotNull(a) => allNull(a)
      case IsNull(a) =>
        colInfo(a).exists { case (_, nulls) => nulls == 0 } &&
          leafIndex.contains(a)
      case StringStartsWith(a, p) =>
        // UTF-8 byte order makes prefix reasoning exact: every string
        // starting with p sorts in [p, p-with-last-byte-bumped). Prune on
        // the low side only when lo > p AND lo does not itself extend p
        // (lo = "applz" > p = "appl" still matches LIKE 'appl%'); prune on
        // the high side whenever hi < p (no extension of p can sort below
        // p, so hi < p proves nothing in the chunk reaches the prefix).
        (for {
          (rOpt, _) <- colInfo(a)
          r <- rOpt
        } yield r match {
          case StringRange(lo, hi) =>
            (utf8Cmp(lo, p) > 0 && !lo.startsWith(p)) || utf8Cmp(hi, p) < 0
          case _ => false
        }).getOrElse(false)
      case _ => false
    }
  }
}
