package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}

/** Temp-write + rename publish, shared by every metadata writer (batch
  * log, compact file, epoch intent marker, manifest): a reader racing
  * the write — or a crash mid-write — sees either the old file or the
  * new one, never a torn one.
  *
  * The temp name is `.<destName>.<uuid><tmpSuffix>`: two concurrent
  * publishers to the same destination (two batch jobs committing one
  * table's schema sidecar, say) each write and rename their OWN
  * fully-written temp, so the survivor is whichever rename lands last —
  * atomically whole either way. A fixed temp name would let publisher B
  * truncate the temp while publisher A sits between close and rename,
  * and A would then publish B's half-written bytes.
  *
  * `tmpSuffix` lets callers keep their orphan-sweep contracts: the
  * streaming sink's epoch markers use `.intent` so `CfTools.clean` and
  * `pruneEpochs` can recognize (and age-sweep) a temp left by a crash
  * mid-marker-write WITHOUT mistaking it for a committed marker body,
  * while plain `.tmp` temps are swept by the batch-log compaction and
  * never parsed as anything.
  *
  * The temp is dot-prefixed, so data-file listings never surface it.
  * `publish` deletes an existing destination before renaming (Hadoop
  * HDFS rename refuses an existing destination); the delete→rename gap
  * reads as "file absent", which every caller treats as a safe fallback
  * state (walk instead of manifest, fresh attempt instead of marker,
  * rewrite of an unsurfaced batch). Callers that need create-exclusive
  * fencing instead (the streaming source's batch log, where an existing
  * destination means a zombie driver is racing a newer driver) use
  * `publishExclusive`.
  */
object AtomicFile {

  private def writeTemp(fs: FileSystem, dest: Path, bytes: Array[Byte],
      tmpSuffix: String): Path = {
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID()}$tmpSuffix")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    tmp
  }

  def publish(fs: FileSystem, dest: Path, bytes: Array[Byte],
      tmpSuffix: String = ".tmp"): Unit = {
    val tmp = writeTemp(fs, dest, bytes, tmpSuffix)
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest)) {
      // don't accumulate one orphan temp per failed attempt (each has a
      // distinct UUID name, so failures would otherwise pile up)
      try fs.delete(tmp, false) catch { case _: Exception => }
      throw new java.io.IOException(s"cannot publish $dest")
    }
  }

  /** Create-exclusive fence: writes `dest` directly with
    * `create(overwrite = false)`, which refuses an existing destination —
    * atomically on HDFS (namenode create is exclusive-by-default) and on
    * object stores with conditional-put semantics; on the local
    * filesystem it degrades to check-then-create, the strongest fence
    * the Hadoop API offers there. A refusal means a concurrent writer
    * already owns this path (zombie-driver scenario) and the caller must
    * fail, not clobber.
    *
    * The trade versus `publish`: the fence is genuine (rename on local /
    * object-store filesystems silently OVERWRITES, so temp+rename cannot
    * fence), but a crash mid-write can leave a torn destination. Callers
    * must therefore tolerate torn content — the streaming batch log
    * does: its reader treats an unparseable tail batch as never-surfaced
    * and rewrites it from a fresh listing, and a tail torn at a line
    * boundary only delays the missing files to the next micro-batch
    * (they are absent from the seen-set, so the next listing re-admits
    * them).
    */
  def publishExclusive(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Unit = {
    val out =
      try fs.create(dest, false)
      catch {
        case e: java.io.IOException =>
          throw new java.io.IOException(
            s"cannot publish $dest exclusively — concurrent writer fence", e)
      }
    try out.write(bytes) finally out.close()
  }
}
