package graft.spark

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Table-level sort-order stamp (`_sort_order.json` at the table root):
  * the write side's declaration that every data file's rows are sorted
  * lexicographically by the listed data columns — SELF-DESCRIBING sort
  * order, so a reader gets the scan's per-partition ordering report
  * (and the sort-free merge joins it enables) with NO read option.
  *
  * The reference's sorted output is self-describing to its own merge
  * consumer (tools/columnfile-sort.cc:337-342: `--merge` trusts
  * pre-sorted runs and never re-sorts); this stamp is that contract
  * made durable at the table root instead of implicit in a pipeline.
  *
  * Trust model, two layers with distinct strengths:
  *
  *  1. WRITER-VERIFIED AT PUBLISH: the `sortedBy` DataWriter compares
  *     every row's sort-column tuple to its predecessor's and fails
  *     the task on the first out-of-order row ([[SortedWriteCheck]]),
  *     so a stamp this engine publishes is a verified fact about the
  *     rows it wrote — including intra-chunk order, which no reader
  *     can prove from chunk stats.
  *  2. SCAN-REFUTED ON CONTRADICTION: the scan passes the stamp
  *     through the same chunk-stats validation as an explicit
  *     `orderedBy` read option ([[ColumnFileScan]]); a stale or
  *     hand-edited stamp whose chunk ranges contradict the claim
  *     fails the query loudly at planning. This layer can only refute
  *     INTER-chunk disorder — a hand-forged stamp over a
  *     single-chunk file is beyond what range stats can check, which
  *     is exactly why layer 1 verifies at the only point the rows are
  *     seen in order.
  *
  * Writers keep the stamp truthful mechanically: a batch commit with
  * `sortedBy=...` publishes the (verified) stamp; ANY other commit to
  * the table (batch append/overwrite without the option, any streaming
  * epoch) clears it, because the new files carry no sort claim.
  * `orderedBy=none` lets a reader opt out of discovery. The claim also
  * rides `_manifest.json` ([[ManifestFile]]) atomically with the file
  * set, so `useManifest` readers discover it with zero extra metadata
  * RPCs; this sidecar file serves directory-walk readers.
  */
object SortOrderStamp {

  val Name = "_sort_order.json"

  /** Atomic publish (same discipline as the schema sidecar/manifest):
    * readers racing a commit see the old stamp or the new one, never a
    * torn file.
    */
  def write(conf: Configuration, root: Path, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "sort-order stamp needs at least one column")
    val fs = root.getFileSystem(conf)
    val body = cols.map(c => "\"" + esc(c) + "\"")
      .mkString("{\"cols\":[", ",", "]}")
    AtomicFile.publish(fs, new Path(root, Name), body.getBytes(UTF_8))
  }

  /** Remove the stamp if present — called by every commit that adds
    * files with no sort claim, so the table can never carry a stale
    * declaration after a well-behaved write. (Out-of-band file drops
    * are caught by the scan-side validation instead.)
    */
  def clear(conf: Configuration, root: Path): Unit = {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Name)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }

  /** The stamped column list; None when no stamp exists. A present but
    * unreadable/malformed stamp throws — a hand-mangled declaration
    * must fail loudly, not silently degrade every consumer to paying
    * avoidable sorts.
    *
    * `strict=true` (the write path) also lets a TRANSIENT existence-
    * check failure propagate: a committer that misread "stamp absent"
    * off an IO blip would silently clear a correct claim (r19 advice).
    * Readers keep the lenient default — "no stamp" merely means no
    * ordering report, which is always safe.
    */
  def read(conf: Configuration, root: Path,
           strict: Boolean = false): Option[Seq[String]] = {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Name)
    val exists =
      if (strict) fs.exists(p)
      else try fs.exists(p) catch { case _: Exception => false }
    if (!exists) return None
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(), UTF_8) finally in.close()
    val cols = parse(s)
    if (cols.isEmpty) throw new IllegalArgumentException(
      s"columnfile: malformed sort-order stamp $p: '$s' — rewrite the " +
        "table with sortedBy=... or delete the stamp")
    Some(cols)
  }

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Minimal parser for the one shape [[write]] produces. Column names
    * here are Spark identifiers (no embedded quotes in practice); the
    * unescape handles the writer's own escapes.
    */
  private def parse(s: String): Seq[String] = {
    val m = """\{\s*"cols"\s*:\s*\[(.*)\]\s*\}""".r
    s.trim match {
      case m(inner) =>
        val item = """"((?:[^"\\]|\\.)*)"""".r
        item.findAllMatchIn(inner).map(mm => unesc(mm.group(1))).toSeq
      case _ => Seq.empty
    }
  }

  private def unesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case e => b.append(e); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
