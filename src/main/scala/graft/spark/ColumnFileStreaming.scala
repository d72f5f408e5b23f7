package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming source over a columnfile directory: each batch
  * covers the files that arrived since the last committed offset
  * (ordered by (modification time, name) — append-only ingestion, the
  * standard file-stream contract). Offsets are just a count into that
  * ordering plus the covered name set's frontier, so restarts resume
  * exactly. Chunk-run partitioning, pruning, and pushdown all reuse the
  * batch scan machinery.
  *
  * Scale: listing is one directory scan per trigger (object-store
  * listing); per-batch work is proportional to new data only. State on
  * the driver is the frontier string — O(1).
  */
final case class ColumnFileOffset(frontier: String) extends Offset {
  override def json(): String = frontier
}

class ColumnFileMicroBatchStream(
    paths: Seq[String],
    tableSchema: StructType,
    filters: Array[Filter],
    conf: Configuration,
    checkpointLocation: String,
    useManifest: Boolean = false)
    extends MicroBatchStream {

  /** Frontier = "<mtime>/<name>" of the last covered file ("" = none).
    * Files sort by this key; a batch covers everything above the start
    * frontier up to the end frontier.
    *
    * Known limit of frontier-based tracking: a file whose mtime equals
    * the frontier file's but whose name sorts below it would be skipped
    * if it appears *after* that batch was planned. Producers writing
    * through our sink get fresh mtimes per commit, so this needs an
    * adversarial writer; an exactly-tracked seen-file log (Spark's
    * FileStreamSource approach) is the upgrade path if one appears.
    */
  private def key(st: org.apache.hadoop.fs.FileStatus): String =
    f"${st.getModificationTime}%020d/${st.getPath.getName}"

  /** Per-trigger listing; with `useManifest=true` the arrivals come
    * from `_manifest.json` (maintained by every upstream commit, incl.
    * the streaming sink's epoch commits), so a cf→cf relay plans each
    * trigger without a single directory-listing RPC.
    */
  private def listAll(): Seq[org.apache.hadoop.fs.FileStatus] =
    ColumnFileDataSource.listDataFilesWithRoots(conf, paths, useManifest)
      .map(_._2).sortBy(key)

  override def initialOffset(): Offset = ColumnFileOffset("")

  override def latestOffset(): Offset = {
    val files = listAll()
    ColumnFileOffset(if (files.isEmpty) "" else key(files.last))
  }

  override def deserializeOffset(json: String): Offset = ColumnFileOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ColumnFileOffset].frontier
    val hi = end.asInstanceOf[ColumnFileOffset].frontier
    val files = listAll().filter(st => key(st) > lo && key(st) <= hi)
    // chunk offsets from the stats sidecar when present (no data-file
    // open per micro-batch), header walk otherwise; parallel across the
    // batch's new files
    ColumnFileDataSource.mapFilesParallel(files) { st =>
      val (offsets, rows): (Array[Long], Array[Long]) =
        ChunkStatsIndex.readWithLen(conf, st.getPath) match {
          case Some((len, ss)) if len == st.getLen &&
              ss.forall(c => c.off >= 0 && c.bytes >= 0) =>
            (ss.map(_.off).toArray, ss.map(_.rows).toArray)
          case _ =>
            val in = new HadoopSeekableInput(
              st.getPath.getFileSystem(conf), st.getPath, st.getLen)
            try (graft.format.ColumnFileReader.scanChunks(in)
              .map(_.headerOffset).toArray, Array.empty[Long])
            finally in.close()
        }
      if (offsets.isEmpty) None
      else Some(ColumnFilePartition(st.getPath.toString, st.getLen, offsets,
        Array.empty, rows))
    }.flatten.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ColumnFileReaderFactory(
      tableSchema.json, tableSchema.json, filters,
      new SerializableHadoopConf(conf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
