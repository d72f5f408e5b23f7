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
  * Concurrency (round 10, VERDICT r9 #4): maintenance is a
  * read-modify-write, serialized by a create-exclusive `_manifest.lock`
  * (the streaming batch log's fencing discipline — atomic on HDFS and
  * conditional-put object stores; check-then-create on the local
  * filesystem). A lock left by a crashed committer is broken after
  * [[LockStaleMs]]. As a second defense for fence-degraded filesystems,
  * every commit VALIDATES after publishing that its own entries
  * survived and retries the merge from the latest manifest if a
  * concurrent writer clobbered them — so racing committers converge to
  * the union instead of last-write-wins, and a persistent storm fails
  * LOUDLY after [[MaxCommitAttempts]] rather than silently dropping
  * entries. (Data files are never at risk either way; a catalog-backed
  * commit protocol remains the upgrade path for heavy multi-writer
  * tables.)
  */
object ManifestFile {

  val Name = "_manifest.json"
  val LockName = "_manifest.lock"

  /** A lock older than this is an abandoned crash leftover: break it. */
  private[spark] val LockStaleMs: Long = 2 * 60 * 1000L
  /** Give up acquiring the lock after this long (loud failure). */
  private[spark] val LockTimeoutMs: Long = 60 * 1000L
  private[spark] val MaxCommitAttempts = 12

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
    *
    * `sortOrder` is the table's sort-order claim ([[SortOrderStamp]]
    * semantics), carried IN the manifest so `useManifest` readers get
    * stamp discovery with zero extra metadata RPCs, and so the claim is
    * atomic with the file set it describes (no stale-stamp crash
    * window for manifest readers). Always emitted — an empty list is an
    * AUTHORITATIVE "no claim" that overrides any stray sidecar stamp.
    */
  def write(conf: Configuration, root: Path, entries: Seq[Entry],
            sortOrder: Seq[String] = Seq.empty): Unit = {
    val fs = root.getFileSystem(conf)
    val files = entries.sortBy(_.rel)
      .map(e => s"""["${esc(e.rel)}",${e.len},${e.mtime}]""")
      .mkString("[", ",", "]")
    val sort = sortOrder.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")
    val body = s"""{"files":$files,"sort":$sort}"""
    AtomicFile.publish(fs, new Path(root, Name), body.getBytes(UTF_8))
  }

  def read(conf: Configuration, root: Path): Option[Seq[Entry]] = {
    // ANY failure — missing, unreadable (e.g. a checksum mismatch after
    // an out-of-band overwrite), malformed — reads as absent: planning
    // falls back to the directory walk rather than failing the query
    try readRaw(conf, root).map(parseFull(_)._1)
    catch { case _: Exception => None }
  }

  /** The manifest-carried sort-order claim. `None` = manifest absent,
    * unreadable, or written before the claim rode the manifest (legacy
    * shape) — the caller falls back to the `_sort_order.json` sidecar;
    * `Some(Seq.empty)` = an authoritative "no claim".
    */
  def readOrder(conf: Configuration, root: Path): Option[Seq[String]] =
    try readRaw(conf, root).flatMap(parseFull(_)._2)
    catch { case _: Exception => None }

  /** ONE-read snapshot of (file entries, sort-order claim): a reader
    * that needs both must take them from the same manifest version —
    * separate reads let a racing commit interleave, pairing an old
    * claim with a newer file set it does not describe. `None` =
    * absent/unreadable (fall back to the walk + sidecar); the inner
    * claim is `None` for legacy files-only manifests.
    */
  def readFull(conf: Configuration, root: Path)
      : Option[(Seq[Entry], Option[Seq[String]])] =
    try readRaw(conf, root).map(parseFull)
    catch { case _: Exception => None }

  private def readRaw(conf: Configuration, root: Path): Option[String] = {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      Some(try new String(in.readAllBytes(), UTF_8) finally in.close())
    }
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
  def append(conf: Configuration, root: Path, added: Seq[Entry],
             sortOrder: (Seq[Entry], Option[Seq[String]]) => Seq[String] =
               (_, _) => Seq.empty,
             mirrorSidecar: Boolean = false): Seq[String] =
    commit(conf, root)(prior =>
      (prior.map(e => e.rel -> e) ++ added.map(e => e.rel -> e))
        .toMap.values.toSeq)(
      manifest => added.forall(manifest.contains))(sortOrder, mirrorSidecar)

  /** Overwrite-commit maintenance: drop `removedRels`, merge `added`.
    * Bootstraps from a walk exactly like [[append]] when no readable
    * manifest exists — the walk runs AFTER the commit deleted its
    * victims, so it reflects the post-overwrite truth.
    */
  def replace(conf: Configuration, root: Path,
              removedRels: Seq[String], added: Seq[Entry],
              sortOrder: (Seq[Entry], Option[Seq[String]]) => Seq[String] =
                (_, _) => Seq.empty,
              mirrorSidecar: Boolean = false): Seq[String] = {
    val removed = removedRels.toSet
    commit(conf, root)(prior =>
      (prior.filterNot(e => removed.contains(e.rel))
        .map(e => e.rel -> e) ++ added.map(e => e.rel -> e))
        .toMap.values.toSeq)(
      manifest => added.forall(manifest.contains) &&
        manifest.forall(e => !removed.contains(e.rel)))(sortOrder, mirrorSidecar)
  }

  /** One fenced, validated read-merge-publish cycle (see the class doc's
    * concurrency section): lock → read-or-walk prior → merge → publish →
    * re-read and check this commit's effect survived; a clobbered commit
    * re-merges from the latest manifest. `sortOrder` computes the
    * manifest-carried claim from (merged file set, PRIOR manifest's
    * claim) — the prior claim is read UNDER the lock from the same
    * manifest the merge read, so racing committers cannot interleave a
    * stale claim over files another commit just added (`None` = legacy
    * files-only manifest or no manifest; the caller may then consult
    * the sidecar stamp it read before its own clear). The claim
    * actually published is returned so the caller can mirror it to the
    * walk-readers' sidecar stamp.
    */
  private def commit(conf: Configuration, root: Path)
      (merge: Seq[Entry] => Seq[Entry])
      (intact: Seq[Entry] => Boolean)
      (sortOrder: (Seq[Entry], Option[Seq[String]]) => Seq[String],
       mirrorSidecar: Boolean = false): Seq[String] = withLock(conf, root) {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Name)
    var attempt = 0
    var done = false
    var stamped: Seq[String] = Seq.empty
    while (!done) {
      attempt += 1
      val priorParsed: Option[(Seq[Entry], Option[Seq[String]])] =
        if (fs.exists(p))
          try readRaw(conf, root).map(parseFull)
          catch { case _: Exception => None }
        else None
      val priorOrder: Option[Seq[String]] = priorParsed.flatMap(_._2)
      val prior: Seq[Entry] = priorParsed match {
        case Some((entries, _)) => entries
        case None =>
          if (fs.exists(p)) { // present but unreadable: rebuild from the truth
            try { fs.delete(p, false); () } catch { case _: Exception => }
          }
          walkEntries(conf, root)
      }
      // On a fence-degraded filesystem (local check-then-create) two
      // committers can still collide inside the publish itself — a
      // failed rename is just another conflict to retry, not fatal.
      val merged = merge(prior)
      stamped = sortOrder(merged, priorOrder)
      val published =
        try { write(conf, root, merged, stamped); true }
        catch { case _: java.io.IOException => false }
      done = published && read(conf, root).exists(intact)
      if (!done && attempt >= MaxCommitAttempts)
        throw new java.io.IOException(
          s"manifest commit at $root lost to concurrent writers after " +
            s"$attempt attempts — entries were NOT silently dropped; retry " +
            "the commit or serialize the writers")
      if (!done)
        Thread.sleep(1L + scala.util.Random.nextInt(20).toLong)
    }
    // Mirror the published claim to the walk-readers' sidecar stamp
    // UNDER THE SAME LOCK: written after the lock releases, two racing
    // committers could interleave (A publishes claim, B clears and
    // appends unsorted files, A's late sidecar write resurrects a
    // claim over B's unvouched files). Inside the lock the sidecar can
    // never disagree with the manifest it mirrors.
    if (mirrorSidecar) {
      if (stamped.nonEmpty) SortOrderStamp.write(conf, root, stamped)
      else SortOrderStamp.clear(conf, root)
    }
    stamped
  }

  /** Mutual exclusion for manifest maintenance, two layers:
    *
    *  1. a JVM-wide monitor per table root — Spark commits run on the
    *     driver, so concurrent committers within one application (the
    *     common case: two jobs of one session writing one table) get
    *     GENUINE mutual exclusion regardless of filesystem semantics;
    *  2. the create-exclusive lock FILE for cross-application writers —
    *     genuine on HDFS and conditional-put object stores; on the
    *     local filesystem it degrades to check-then-create (for local
    *     cross-process tables the validated-merge retry in [[commit]]
    *     narrows, but cannot fully close, the lost-update window).
    */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withLock[T](conf: Configuration, root: Path)(body: => T): T = {
    val mon = jvmLocks.computeIfAbsent(root.toUri.toString, _ => new Object)
    mon.synchronized(withFileLock(conf, root)(body))
  }

  /** Create-exclusive file fence (layer 2). The lock body carries
    * owner + acquisition time; a lock whose mtime is older than
    * [[LockStaleMs]] is an abandoned crash leftover and is broken.
    * Acquisition fails loudly after [[LockTimeoutMs]].
    */
  private def withFileLock[T](conf: Configuration, root: Path)(body: => T): T = {
    val fs = root.getFileSystem(conf)
    val lock = new Path(root, LockName)
    val deadline = System.currentTimeMillis() + LockTimeoutMs
    var held = false
    while (!held) {
      try {
        AtomicFile.publishExclusive(fs, lock,
          s"${java.util.UUID.randomUUID()} ${System.currentTimeMillis()}"
            .getBytes(UTF_8))
        held = true
      } catch {
        case _: java.io.IOException =>
          val stale = try {
            System.currentTimeMillis() -
              fs.getFileStatus(lock).getModificationTime > LockStaleMs
          } catch { case _: Exception => false } // vanished: retry create
          if (stale) {
            try { fs.delete(lock, false); () } catch { case _: Exception => }
          } else if (System.currentTimeMillis() > deadline)
            throw new java.io.IOException(
              s"timed out acquiring manifest lock $lock — a concurrent " +
                s"committer holds it (or delete a stale lock by hand)")
          else Thread.sleep(5L + scala.util.Random.nextInt(25).toLong)
      }
    }
    try body
    finally { try fs.delete(lock, false) catch { case _: Exception => } }
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

  /** Minimal strict parser for the shapes write() emits: the current
    * files+sort form, and the legacy (pre-claim) files-only form — a
    * legacy manifest parses with `sort = None` so readers fall back to
    * the sidecar stamp instead of dropping a truthful claim.
    */
  private def parseFull(s: String): (Seq[Entry], Option[Seq[String]]) = {
    val t = s.trim
    require(t.startsWith("{\"files\":["), "bad manifest")
    var i = "{\"files\":[".length
    def parseString(): String = {
      require(t(i) == '"', "bad manifest string"); i += 1
      val sb = new StringBuilder
      while (t(i) != '"') {
        if (t(i) == '\\') {
          i += 1
          t(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              sb += Integer.parseInt(t.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => sb += other
          }
        } else sb += t(i)
        i += 1
      }
      i += 1 // closing quote
      sb.toString
    }
    val out = Seq.newBuilder[Entry]
    if (t(i) == ']') i += 1
    else {
      var more = true
      while (more) {
        require(t(i) == '[', "bad manifest entry"); i += 1
        val rel = parseString()
        require(t(i) == ',', "bad manifest entry")
        val endLen = t.indexOf(',', i + 1)
        val len = t.substring(i + 1, endLen).trim.toLong
        val endNum = t.indexOf(']', endLen + 1)
        val mtime = t.substring(endLen + 1, endNum).trim.toLong
        out += Entry(rel, len, mtime)
        i = endNum + 1
        if (t(i) == ',') i += 1
        else { require(t(i) == ']', "bad manifest separator"); i += 1; more = false }
      }
    }
    val sort: Option[Seq[String]] =
      if (t.startsWith("}", i)) None // legacy files-only manifest
      else {
        require(t.startsWith(",\"sort\":[", i), "bad manifest tail")
        i += ",\"sort\":[".length
        val cols = Seq.newBuilder[String]
        if (t(i) == ']') i += 1
        else {
          var more = true
          while (more) {
            cols += parseString()
            if (t(i) == ',') i += 1
            else { require(t(i) == ']', "bad sort separator"); i += 1; more = false }
          }
        }
        require(t.startsWith("}", i), "bad manifest end")
        Some(cols.result())
      }
    (out.result(), sort)
  }
}
