package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}

/** Temp-write + rename publish, shared by every metadata writer (batch
  * log, compact file, epoch intent marker, manifest): a reader racing
  * the write — or a crash mid-write — sees either the old file or the
  * new one, never a torn one.
  *
  * The temp is dot-prefixed, so data-file listings never surface it.
  * Hadoop rename refuses an existing destination, so the destination is
  * deleted first; the delete→rename gap reads as "file absent", which
  * every caller treats as a safe fallback state (walk instead of
  * manifest, fresh attempt instead of marker, rewrite of an unsurfaced
  * batch).
  */
object AtomicFile {

  def publish(fs: FileSystem, dest: Path, bytes: Array[Byte],
      tmpSuffix: String = ".tmp"): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}$tmpSuffix")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"cannot publish $dest")
  }
}
