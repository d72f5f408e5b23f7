package graft.spark

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style partitioned directory layout for the columnfile format:
  * `root/col1=v1/col2=v2/part-*.cf`. Partition column values live only
  * in directory names (not in the data files); the read side synthesizes
  * them as constants per file and prunes whole directories on partition
  * predicates before any I/O — the first-order 100 TB lever: a filter on
  * the partition key turns a full-table scan into a handful of
  * directory listings.
  *
  * `_partition.json` at the root records the partition column names in
  * order (types come from the `_schema.json` full logical schema).
  */
object PartitionLayout {

  val Sidecar = "_partition.json"
  val NullMarker = "__HIVE_DEFAULT_PARTITION__"

  /** Types allowed as partition columns (directory-name round-trippable). */
  def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType | BooleanType |
         StringType | DateType => true
    case _ => false
  }

  def write(conf: Configuration, root: Path, cols: Seq[String]): Unit =
    AtomicFile.publish(root.getFileSystem(conf), new Path(root, Sidecar),
      cols.map(c => "\"" + c + "\"")
        .mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8))

  def read(conf: Configuration, root: Path): Seq[String] = {
    val fs = root.getFileSystem(conf)
    val p = new Path(root, Sidecar)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
              finally in.close()
      s.trim.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    }
  }

  /** Render a Catalyst value of `dt` for a directory name. */
  def render(dt: DataType, value: Any): String = value match {
    case null => NullMarker
    case _ => dt match {
      case StringType => esc(value.asInstanceOf[UTF8String].toString)
      case DateType =>
        java.time.LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong).toString
      case BooleanType => value.toString
      case _ => value.toString
    }
  }

  /** Parse a directory-name value back to the Catalyst value of `dt`. */
  def parse(dt: DataType, raw: String): Any =
    if (raw == NullMarker) null
    else dt match {
      case StringType  => UTF8String.fromString(unesc(raw))
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case ShortType   => raw.toShort
      case ByteType    => raw.toByte
      case BooleanType => raw.toBoolean
      case DateType    => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case other =>
        throw new IllegalArgumentException(s"unsupported partition type $other")
    }

  /** Extract (col -> raw value) pairs from a file's path relative to the
    * table root; Nil for files directly at the root.
    */
  def valuesFor(root: Path, file: Path, cols: Seq[String]): Seq[String] = {
    if (cols.isEmpty) return Seq.empty
    // compare scheme-independently: listings may be file:/x while the
    // caller passed /x
    val rootNorm = root.toUri.getPath
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = file.getParent
    while (cur != null && cur.toUri.getPath != rootNorm) {
      segs.prepend(cur.getName)
      cur = cur.getParent
    }
    require(segs.length == cols.length,
      s"columnfile: expected ${cols.length} partition dirs under $rootNorm " +
        s"for ${file.toUri.getPath}, found ${segs.length}")
    cols.zip(segs).map { case (c, seg) =>
      val i = seg.indexOf('=')
      require(i > 0 && seg.substring(0, i) == c,
        s"columnfile: malformed partition dir '$seg' (expected $c=...)")
      seg.substring(i + 1)
    }
  }

  private def esc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8.name())
  private def unesc(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8.name())
}
