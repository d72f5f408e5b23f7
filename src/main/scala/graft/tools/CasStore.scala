package graft.tools

import java.security.MessageDigest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Content-addressed storage for columnfile (or any) files — the
  * idiomatic equivalent of the reference tools' optional CAS-table I/O
  * (`tools/columnfile-cat.cc:22-24,47`: `HAVE_CA_CAS` content-
  * addressable `urn:` inputs/outputs). The reference talks to a bespoke
  * CAS daemon; on a cluster the natural CAS substrate is the Hadoop
  * filesystem itself (HDFS / object stores), so this stores objects
  * under their SHA-256 digest and resolves `urn:graft:ca:sha256:<hex>`
  * back to a readable path.
  *
  * Properties a CAS gives a 100 TB pipeline, all held here:
  * - **Idempotent put**: identical content maps to one stored object
  *   regardless of how many writers put it (the temp+rename commit
  *   means a losing racer just discards its temp copy). Re-publishing
  *   a dataset costs nothing when nothing changed.
  * - **Immutability + verification**: objects never change once
  *   stored; `verify` re-hashes an object against its urn, so bit rot
  *   is detectable end-to-end (the format itself has no checksums,
  *   faithful to the reference — the CAS layer is where integrity
  *   naturally lives).
  * - **Fan-out sharding**: objects land under a 2-hex-char prefix dir
  *   (256-way), so no single directory grows unboundedly on stores
  *   with per-directory listing costs.
  */
object CasStore {

  private val UrnPrefix = "urn:graft:ca:sha256:"

  def isUrn(s: String): Boolean = s.startsWith(UrnPrefix)

  private def digestHex(fs: FileSystem, p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) md.update(buf, 0, n)
        n = in.read(buf)
      }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def objectPath(storeDir: Path, hex: String): Path =
    new Path(new Path(storeDir, hex.substring(0, 2)), hex)

  /** Store `file`'s content; returns its urn. Idempotent: if the object
    * already exists the file is not copied again.
    */
  def put(conf: Configuration, storeDir: String, file: String): String = {
    val src = new Path(file)
    val fs = src.getFileSystem(conf)
    val store = new Path(storeDir)
    val sfs = store.getFileSystem(conf)
    val hex = digestHex(fs, src)
    val dst = objectPath(store, hex)
    if (!sfs.exists(dst)) {
      sfs.mkdirs(dst.getParent)
      val tmp = new Path(dst.getParent,
        s".${dst.getName}.tmp-${java.util.UUID.randomUUID()}")
      org.apache.hadoop.fs.FileUtil.copy(fs, src, sfs, tmp, false, conf)
      // losing a commit race is fine: the winner's object is our content
      if (!sfs.rename(tmp, dst) && !sfs.exists(dst))
        throw new java.io.IOException(s"CAS commit failed for $dst")
      if (sfs.exists(tmp)) { sfs.delete(tmp, false); () }
    }
    UrnPrefix + hex
  }

  /** Resolve a urn to its stored object's path (loudly absent-safe). */
  def resolve(conf: Configuration, storeDir: String, urn: String): String = {
    require(isUrn(urn), s"not a graft CAS urn: $urn")
    val store = new Path(storeDir)
    val p = objectPath(store, urn.stripPrefix(UrnPrefix))
    val fs = store.getFileSystem(conf)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(s"$urn not in $storeDir")
    p.toString
  }

  /** Re-hash a stored object against its urn (bit-rot detection). An
    * object that cannot be read back cleanly (e.g. the filesystem's own
    * checksum layer already rejects it) fails verification rather than
    * throwing — the caller's question is "is this object good", and an
    * unreadable object is not.
    */
  def verify(conf: Configuration, storeDir: String, urn: String): Boolean = {
    val p = new Path(resolve(conf, storeDir, urn))
    try {
      val hex = digestHex(p.getFileSystem(conf), p)
      UrnPrefix + hex == urn
    } catch { case _: java.io.IOException => false }
  }
}
