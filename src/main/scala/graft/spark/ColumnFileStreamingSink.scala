package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DataType, StructType}

/** Streaming half of the sink: `df.writeStream.format("columnfile")`.
  *
  * Exactly-once across restarts via idempotent epoch commits:
  *
  *  - tasks write data (and their stats sidecars) under dot-prefixed
  *    in-progress names — invisible to readers, whose listing skips
  *    dot/underscore entries (`ColumnFileDataSource.listDataFilesWithRoots`);
  *  - `commit(epoch)` renames data + sidecar to final names, then records
  *    the epoch in `_epochs/<id>`;
  *  - a REPLAYED epoch (micro-batch re-run after a restart that lost the
  *    sink's ack but not the commit) finds its marker and deletes the
  *    replayed files instead of publishing duplicates;
  *  - `abort` deletes the in-progress files, same contract as the batch
  *    path's abort.
  *
  * Renames are one per task file per micro-batch — bounded by the
  * trigger's task count, not table size (the bulk batch path never
  * renames; see ColumnFileWrite's scale note). In-progress files from a
  * crash without abort stay invisible forever and are reclaimed by
  * `CfTools.clean`, the age-guarded orphan sweep.
  *
  * Append-mode only: files are immutable once published, like every
  * file-format streaming sink. Partitioned tables work — each row routes
  * to its `col=value/` directory exactly as in the batch writer.
  */
final class ColumnFileStreamingWrite(
    path: String,
    schema: StructType,
    compression: Int,
    targetChunkBytes: Long,
    conf: SerializableHadoopConf,
    partitionCols: Seq[String],
    dictionary: Boolean = false)
    extends StreamingWrite {

  private def dir = new Path(path)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    dir.getFileSystem(conf.conf).mkdirs(dir)
    new ColumnFileStreamingWriterFactory(path, schema.json, compression,
      targetChunkBytes, java.util.UUID.randomUUID().toString, conf,
      partitionCols, dictionary)
  }

  private def epochMarker(epochId: Long): Path =
    new Path(new Path(dir, "_epochs"), epochId.toString)

  private def files(messages: Array[WriterCommitMessage]): Seq[String] =
    messages.toSeq.flatMap {
      case ColumnFileCommitMessage(f)             => Seq(f)
      case ColumnFilePartitionedCommitMessage(fs) => fs
      case _                                      => Seq.empty
    }

  private def sidecarOf(p: Path): Path =
    new Path(p.getParent, "." + p.getName + ChunkStatsIndex.Suffix)

  private def delete(fs: FileSystem, f: String): Unit = {
    val p = new Path(f)
    try fs.delete(p, false) catch { case _: Exception => }
    try fs.delete(sidecarOf(p), false) catch { case _: Exception => }
    // a partitioned write may have created col=value dirs just for this
    // attempt; sweep any now-empty ones up to (not including) the root
    try {
      var parent = p.getParent
      val rootPath = dir.toUri.getPath
      while (parent != null && parent.toUri.getPath != rootPath &&
          fs.listStatus(parent).isEmpty) {
        fs.delete(parent, false)
        parent = parent.getParent
      }
    } catch { case _: Exception => }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = dir.getFileSystem(conf.conf)
    val marker = epochMarker(epochId)
    if (fs.exists(marker)) {
      files(messages).foreach(delete(fs, _)) // replay of a committed epoch
      return
    }
    val published = files(messages).map { f =>
      val tmp = new Path(f)
      require(tmp.getName.startsWith("."), s"not an in-progress file: $f")
      val fin = new Path(tmp.getParent, tmp.getName.substring(1))
      fs.rename(tmp, fin)
      val tmpSide = sidecarOf(tmp)
      if (fs.exists(tmpSide)) fs.rename(tmpSide, sidecarOf(fin))
      fin
    }
    ManifestFile.append(conf.conf, dir,
      published.map(ManifestFile.entryFor(conf.conf, dir, _)))
    val sc = fs.create(new Path(dir, ColumnFileDataSource.SchemaSidecar), true)
    try sc.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally sc.close()
    if (partitionCols.nonEmpty)
      PartitionLayout.write(conf.conf, dir, partitionCols)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = dir.getFileSystem(conf.conf)
    files(messages).foreach(delete(fs, _))
  }
}

final class ColumnFileStreamingWriterFactory(
    dir: String,
    schemaJson: String,
    compression: Int,
    targetChunkBytes: Long,
    jobId: String,
    conf: SerializableHadoopConf,
    partitionCols: Seq[String],
    dictionary: Boolean = false)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    // epoch in the name: replayed epochs under a fresh jobId can never
    // collide with a previous attempt's published files
    val fileName = f".part-e$epochId%010d-$partitionId%05d-$jobId${ColumnFileDataSource.FileExtension}"
    if (partitionCols.isEmpty)
      new ColumnFileDataWriter(new Path(dir, fileName), schema, compression,
        targetChunkBytes, conf.conf, dictionary)
    else
      new ColumnFilePartitionedDataWriter(new Path(dir), fileName, schema,
        partitionCols, compression, targetChunkBytes, conf.conf, dictionary)
  }
}
