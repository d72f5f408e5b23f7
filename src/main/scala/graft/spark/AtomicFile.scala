package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}

/** Temp-write + rename publish, shared by every metadata writer (batch
  * log, compact file, epoch intent marker, manifest): a reader racing
  * the write — or a crash mid-write — sees either the old file or the
  * new one, never a torn one.
  *
  * The temp name carries a per-call UUID: two concurrent publishers to
  * the same destination (two batch jobs committing one table's schema
  * sidecar, say) each write and rename their OWN fully-written temp, so
  * the survivor is whichever rename lands last — atomically whole either
  * way. A fixed temp name would let publisher B truncate the temp while
  * publisher A sits between close and rename, and A would then publish
  * B's half-written bytes.
  *
  * The temp is dot-prefixed, so data-file listings never surface it.
  * Hadoop rename refuses an existing destination, so `publish` deletes
  * the destination first; the delete→rename gap reads as "file absent",
  * which every caller treats as a safe fallback state (walk instead of
  * manifest, fresh attempt instead of marker, rewrite of an unsurfaced
  * batch). Callers that need create-exclusive fencing instead (the
  * streaming batch log, where an overwrite means a zombie driver is
  * clobbering a newer driver's file) use `publishExclusive`, which
  * keeps rename's refuse-existing semantics and reports the collision.
  */
object AtomicFile {

  private def writeTemp(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Path = {
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    tmp
  }

  def publish(fs: FileSystem, dest: Path, bytes: Array[Byte]): Unit = {
    val tmp = writeTemp(fs, dest, bytes)
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"cannot publish $dest")
  }

  /** Like `publish` but never deletes an existing destination: rename's
    * refuse-existing behavior IS the fence. A pre-existing destination
    * (or a rename loss to a concurrent creator) throws — the caller is a
    * stale writer and must not silently clobber the incumbent file.
    */
  def publishExclusive(fs: FileSystem, dest: Path,
      bytes: Array[Byte]): Unit = {
    if (fs.exists(dest))
      throw new java.io.IOException(
        s"refusing to overwrite existing $dest — concurrent writer fence")
    val tmp = writeTemp(fs, dest, bytes)
    if (!fs.rename(tmp, dest)) {
      try fs.delete(tmp, false) catch { case _: Exception => }
      throw new java.io.IOException(
        s"cannot publish $dest exclusively — concurrent writer fence")
    }
  }
}
