package graft.spark

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/** Table-level file manifest (`_manifest.json` at the table root) — the
  * optional replacement for per-query directory walks.
  *
  * Planning normally lists the table tree with Hadoop `listStatus`; at
  * 100 TB file counts that is O(directories) RPCs per query on an object
  * store. Every commit path of this engine (batch, streaming epoch,
  * compaction via batch) already knows exactly which files it published,
  * so it maintains one manifest listing (relative path, length, mtime)
  * per data file. A reader that passes `useManifest=true` plans from the
  * manifest alone — zero listing RPCs; the sidecar reads it does next
  * are per-FILE, not per-directory, and were always needed.
  *
  * Trust model (the standard manifest trade, cf. table formats like
  * Iceberg): with `useManifest=true` the manifest IS the file listing —
  * files added behind the engine's back are invisible until a rewrite.
  * Hence opt-in on the read side; writers maintain it unconditionally
  * (one small JSON write per commit). A malformed manifest reads as
  * absent and planning falls back to the walk.
  *
  * Concurrency: maintenance is a read-modify-write with no atomic swap,
  * so it assumes ONE writer per table at a time — the same contract
  * every file-based Spark sink has for its output directory. Two truly
  * concurrent committers can lose each other's manifest entries (never
  * data files); a catalog-backed commit protocol is the upgrade path if
  * multi-writer tables appear.
  */
object ManifestFile {

  val Name = "_manifest.json"

  final case class Entry(rel: String, len: Long, mtime: Long)

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Atomic publish (temp + rename, the sink marker's discipline): a
    * reader racing a commit, or a crash mid-write, sees either the old
    * manifest or the new one — never a torn file that silently degrades
    * `useManifest` planning back to the directory walk.
    */
  def write(conf: Configuration, root: Path, entries: Seq[Entry]): Unit = {
    val fs = root.getFileSystem(conf)
    val body = entries.sortBy(_.rel)
      .map(e => s"""["${esc(e.rel)}",${e.len},${e.mtime}]""")
      .mkString("{\"files\":[", ",", "]}")
    AtomicFile.publish(fs, new Path(root, Name), body.getBytes(UTF_8))
  }

  def read(conf: Configuration, root: Path): Option[Seq[Entry]] = {
    // ANY failure — missing, unreadable (e.g. a checksum mismatch after
    // an out-of-band overwrite), malformed — reads as absent: planning
    // falls back to the directory walk rather than failing the query
    try {
      val fs = root.getFileSystem(conf)
      val p = new Path(root, Name)
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), UTF_8) finally in.close()
      Some(parse(s))
    } catch { case _: Exception => None }
  }

  /** Merge `added` into the existing manifest (append-style commits);
    * entries replace by relative path.
    *
    * When no readable manifest exists — a legacy table written before
    * the manifest feature, or a corrupt one — the prior entries are
    * bootstrapped from a FULL directory walk, never from just `added`:
    * a manifest listing only the new files would make `useManifest`
    * readers silently miss the table's older data. The walk runs once
    * per such commit and the table is manifest-complete afterwards.
    */
  def append(conf: Configuration, root: Path, added: Seq[Entry]): Unit = {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Name)
    val prior: Seq[Entry] =
      if (fs.exists(p)) read(conf, root) match {
        case Some(entries) => entries
        case None => // present but unreadable: rebuild from the truth
          try { fs.delete(p, false); () } catch { case _: Exception => }
          walkEntries(conf, root)
      }
      else walkEntries(conf, root)
    val merged = (prior.map(e => e.rel -> e) ++ added.map(e => e.rel -> e))
      .toMap.values.toSeq
    write(conf, root, merged)
  }

  /** Overwrite-commit maintenance: drop `removedRels`, merge `added`.
    * Bootstraps from a walk exactly like [[append]] when no readable
    * manifest exists — the walk runs AFTER the commit deleted its
    * victims, so it reflects the post-overwrite truth.
    */
  def replace(conf: Configuration, root: Path,
              removedRels: Seq[String], added: Seq[Entry]): Unit = {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Name)
    val prior: Seq[Entry] =
      if (fs.exists(p)) read(conf, root) match {
        case Some(entries) => entries
        case None =>
          try { fs.delete(p, false); () } catch { case _: Exception => }
          walkEntries(conf, root)
      }
      else walkEntries(conf, root)
    val removed = removedRels.toSet
    val merged = (prior.filterNot(e => removed.contains(e.rel))
      .map(e => e.rel -> e) ++ added.map(e => e.rel -> e)).toMap.values.toSeq
    write(conf, root, merged)
  }

  /** All data files under `root`, as manifest entries (full listing —
    * the bootstrap/repair path only).
    */
  private def walkEntries(conf: Configuration, root: Path): Seq[Entry] =
    ColumnFileDataSource
      .listDataFilesWithRoots(conf, Seq(root.toString), useManifest = false)
      .map { case (_, st) =>
        Entry(relativize(root, st.getPath), st.getLen, st.getModificationTime)
      }

  /** Relative path of `file` under `root`, scheme-independent. */
  def relativize(root: Path, file: Path): String = {
    val r = root.toUri.getPath.stripSuffix("/")
    val f = file.toUri.getPath
    require(f.startsWith(r + "/"), s"$file not under $root")
    f.substring(r.length + 1)
  }

  def entryFor(conf: Configuration, root: Path, file: Path): Entry = {
    val st = file.getFileSystem(conf).getFileStatus(file)
    Entry(relativize(root, file), st.getLen, st.getModificationTime)
  }

  /** Materialize manifest entries as the (root, FileStatus) pairs the
    * planner consumes — no filesystem calls.
    */
  def statuses(root: Path, entries: Seq[Entry]): Seq[(Path, FileStatus)] =
    entries.map { e =>
      (root, new FileStatus(e.len, false, 1, 0, e.mtime, new Path(root, e.rel)))
    }

  // minimal strict parser for the exact shape write() emits
  private def parse(s: String): Seq[Entry] = {
    val t = s.trim
    require(t.startsWith("{\"files\":[") && t.endsWith("]}"), "bad manifest")
    val body = t.stripPrefix("{\"files\":[").stripSuffix("]}").trim
    if (body.isEmpty) return Seq.empty
    val out = Seq.newBuilder[Entry]
    var i = 0
    while (i < body.length) {
      require(body(i) == '[', "bad manifest entry")
      i += 1
      require(body(i) == '"', "bad manifest entry")
      i += 1
      val sb = new StringBuilder
      while (body(i) != '"') {
        if (body(i) == '\\') {
          i += 1
          body(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              sb += Integer.parseInt(body.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => sb += other
          }
        } else sb += body(i)
        i += 1
      }
      i += 1 // closing quote
      require(body(i) == ',', "bad manifest entry")
      val endLen = body.indexOf(',', i + 1)
      val len = body.substring(i + 1, endLen).trim.toLong
      val endNum = body.indexOf(']', endLen + 1)
      val mtime = body.substring(endLen + 1, endNum).trim.toLong
      out += Entry(sb.toString, len, mtime)
      i = endNum + 1
      if (i < body.length) {
        require(body(i) == ',', "bad manifest separator")
        i += 1
      }
    }
    out.result()
  }
}
