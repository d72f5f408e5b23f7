package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** readStream over the columnfile format: new files become new
  * micro-batches; restarts replay exactly from the per-batch file log.
  */
class StreamingSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("cf-streaming-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("availableNow processes existing files, new files on next run") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-src").toString
    val ckpt = Files.createTempDirectory("cf-stream-ckpt").toString
    val sink = Files.createTempDirectory("cf-stream-sink").toString

    (0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema

    def runOnce(): Unit = {
      val q = spark.readStream.format("columnfile").schema(schema).load(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(sink).count() == 100)

    // appending adds new files; only they are processed on the next run
    (100 until 130).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .write.format("columnfile").mode("append").save(src)
    runOnce()
    val all = spark.read.parquet(sink)
    assert(all.count() == 130)
    assert(all.agg(min("id"), max("id")).head.toSeq == Seq(0L, 129L))

    // idempotent: no new files, no new rows
    runOnce()
    assert(spark.read.parquet(sink).count() == 130)
  }

  test("exact file tracking: equal/older-mtime late arrivals are never skipped") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-exact").toString
    val ckpt = Files.createTempDirectory("cf-stream-exact-ckpt").toString
    val sink = Files.createTempDirectory("cf-stream-exact-sink").toString

    (0 until 50).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema
    def runOnce(): Unit = {
      val q = spark.readStream.format("columnfile").schema(schema).load(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 50)

    // adversarial late arrival: a file whose NAME sorts before the
    // already-processed file and whose MTIME is set OLDER than it — an
    // mtime/name frontier would silently skip this; the exact seen-file
    // log must not
    val processed = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension)).head
    val late = new java.io.File(src, "a-0000-late.cf")
    java.nio.file.Files.copy(processed.toPath, late.toPath)
    assert(late.setLastModified(processed.lastModified() - 60000))
    runOnce()
    assert(spark.read.parquet(sink).count() == 100,
      "late equal/older-mtime arrival was skipped")
    // and nothing double-processes on another idle run
    runOnce()
    assert(spark.read.parquet(sink).count() == 100)
  }

  test("a torn batch-log tail (crash mid-write) does not wedge the stream") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-torn").toString
    val ckpt = Files.createTempDirectory("cf-stream-torn-ckpt").toString
    val sink = Files.createTempDirectory("cf-stream-torn-sink").toString

    (0 until 40).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema
    def runOnce(): Unit = {
      val q = spark.readStream.format("columnfile").schema(schema).load(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 40)

    // simulate a pre-rename-era crash mid-write: a tail batch file whose
    // last line is truncated (no tab separator). Its offset was never
    // surfaced, so recovery = ignore and rewrite — not a permanent wedge
    // Spark hands each source a nested checkpoint dir: <ckpt>/sources/0
    val logDir = new java.io.File(ckpt, "sources/0/graft-file-batches")
    assert(logDir.isDirectory, s"unexpected checkpoint layout: $ckpt")
    val torn = new java.io.File(logDir, "1")
    java.nio.file.Files.write(torn.toPath,
      "/nowhere/partial-file-no-tab".getBytes("UTF-8"))

    (40 until 60).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .write.format("columnfile").mode("append").save(src)
    runOnce() // would throw inside loggedBatches/readBatch before the fix
    assert(spark.read.parquet(sink).count() == 60)
    runOnce() // and stays idempotent
    assert(spark.read.parquet(sink).count() == 60)
  }

  test("a tail torn mid-number (still line-parseable) is detected and rewritten") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-torn2").toString
    val ckpt = Files.createTempDirectory("cf-stream-torn2-ckpt").toString
    val sink = Files.createTempDirectory("cf-stream-torn2-sink").toString

    (0 until 30).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema
    def runOnce(): Unit = {
      val q = spark.readStream.format("columnfile").schema(schema).load(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 30)

    // the nastier crash shape: the write died inside the LENGTH digits,
    // so every line still splits on tab and parses as a long — only the
    // missing trailing newline betrays the tear. Treating this as valid
    // would plan a batch with a wrong byte length for a real file.
    val dataFile = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension)).head
    val logDir = new java.io.File(ckpt, "sources/0/graft-file-batches")
    assert(logDir.isDirectory, s"unexpected checkpoint layout: $ckpt")
    java.nio.file.Files.write(new java.io.File(logDir, "1").toPath,
      s"file:${dataFile.getAbsolutePath}\t1".getBytes("UTF-8"))

    (30 until 45).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      .write.format("columnfile").mode("append").save(src)
    runOnce()
    // the torn batch was rewritten from a fresh listing: only the 15 new
    // rows arrive — NOT a re-read of the already-processed file and NOT
    // a 1-byte truncated read of it
    assert(spark.read.parquet(sink).count() == 45)
    runOnce()
    assert(spark.read.parquet(sink).count() == 45)
  }

  test("batch log compacts past committed offsets; restarts stay exact") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-compact").toString
    val ckpt = Files.createTempDirectory("cf-stream-compact-ckpt").toString
    val conf = spark.sessionState.newHadoopConf()

    def addFile(i: Int): Unit =
      Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(1)
        .write.format("columnfile").mode(if (i == 0) "overwrite" else "append")
        .save(src)
    addFile(0)
    val schema = spark.read.format("columnfile").load(src).schema

    // drive the source directly: one logged batch per new file
    val stream = new ColumnFileMicroBatchStream(
      Seq(src), schema, Array.empty, conf, ckpt)
    var off = stream.latestOffset()
    assert(off == ColumnFileOffset(1L))
    (1 until 20).foreach { i => addFile(i); off = stream.latestOffset() }
    assert(off == ColumnFileOffset(20L))

    // committing past the interval folds batches into one compact file
    stream.commit(ColumnFileOffset(20L))
    val names = new java.io.File(ckpt, "graft-file-batches").listFiles()
      .map(_.getName).toSeq
    assert(names.contains("_seen.compact.20"))
    assert(!names.exists(n => scala.util.Try(n.toLong).toOption.exists(_ < 20)),
      s"per-batch files below the compaction point survive: $names")

    // a RESTARTED source over the compacted log: Spark's recovery calls
    // commit(lastCommitted) on the fresh instance BEFORE latestOffset,
    // so commit must re-discover the compaction point from disk rather
    // than trusting its in-memory zero and re-reading deleted batches
    val stream2 = new ColumnFileMicroBatchStream(
      Seq(src), schema, Array.empty, conf, ckpt)
    stream2.commit(ColumnFileOffset(20L)) // threw FileNotFound before fix
    assert(stream2.latestOffset() == ColumnFileOffset(20L), "seen files resurfaced")
    addFile(20)
    assert(stream2.latestOffset() == ColumnFileOffset(21L))
    val parts = stream2.planInputPartitions(
      ColumnFileOffset(20L), ColumnFileOffset(21L))
    assert(parts.length == 1, "compacted history leaked into a new batch plan")
  }

  test("maxFilesPerTrigger rate-limits batches; AvailableNow drains the snapshot exactly") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-rate").toString
    val ckpt = Files.createTempDirectory("cf-stream-rate-ckpt").toString
    val sink = Files.createTempDirectory("cf-stream-rate-sink").toString

    // 6 single-row files
    (0 until 6).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").repartition(1)
        .write.format("columnfile")
        .mode(if (i == 0) "overwrite" else "append").save(src)
    }
    val schema = spark.read.format("columnfile").load(src).schema
    val q = spark.readStream.format("columnfile").schema(schema)
      .option("maxFilesPerTrigger", "2").load(src)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // all six files processed, in ceil(6/2)=3 batches
    assert(spark.read.parquet(sink).count() == 6)
    val batches = new java.io.File(ckpt, "sources/0/graft-file-batches")
      .listFiles().map(_.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
    assert(batches.toSet == Set(0L, 1L, 2L),
      s"expected 3 rate-limited batches, got ${batches.sorted.toSeq}")
  }

  test("maxBytesPerTrigger admits at least one file and stops before the cap") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-bytes").toString
    val ckpt = Files.createTempDirectory("cf-stream-bytes-ckpt").toString
    val conf = spark.sessionState.newHadoopConf()

    (0 until 4).foreach { i =>
      (0 until 200).map(j => (i * 1000L + j, s"v$j")).toDF("id", "v")
        .repartition(1).write.format("columnfile")
        .mode(if (i == 0) "overwrite" else "append").save(src)
    }
    val schema = spark.read.format("columnfile").load(src).schema
    val fileLen = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension))
      .map(_.length()).max

    // cap below one file: each batch still admits exactly one file
    val stream = new ColumnFileMicroBatchStream(
      Seq(src), schema, Array.empty, conf, ckpt,
      maxBytesPerTrigger = Some(fileLen / 2))
    val off1 = stream.latestOffset(null,
      stream.getDefaultReadLimit).asInstanceOf[ColumnFileOffset]
    assert(off1 == ColumnFileOffset(1L))
    assert(stream.planInputPartitions(ColumnFileOffset(0L), off1).length == 1,
      "an over-cap file must admit alone, not stall")

    // cap covering ~2.5 files: admits 2, never crosses the cap
    val stream2 = new ColumnFileMicroBatchStream(
      Seq(src), schema, Array.empty, conf,
      Files.createTempDirectory("cf-stream-bytes-ckpt2").toString,
      maxBytesPerTrigger = Some((fileLen * 5) / 2))
    val off2 = stream2.latestOffset(null,
      stream2.getDefaultReadLimit).asInstanceOf[ColumnFileOffset]
    assert(stream2.planInputPartitions(ColumnFileOffset(0L), off2).length == 2,
      "byte cap should admit two files")

    // a ZERO-LENGTH file (crashed writer's leftover — can't even hold
    // the magic) is skipped by listing: it neither wedges planning nor
    // counts against any cap
    val src2 = Files.createTempDirectory("cf-stream-bytes0").toString
    (0 until 200).map(j => (j.toLong, s"v$j")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("overwrite").save(src2)
    val real = new java.io.File(src2).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension)).head
    val empty = new java.io.File(src2, "a-empty.cf")
    assert(empty.createNewFile())
    assert(empty.setLastModified(real.lastModified() - 60000)) // sorts first
    assert(spark.read.format("columnfile").load(src2).count() == 200,
      "zero-length leftover wedged the batch scan")
    val stream3 = new ColumnFileMicroBatchStream(
      Seq(src2), spark.read.format("columnfile").load(src2).schema,
      Array.empty, conf,
      Files.createTempDirectory("cf-stream-bytes0-ckpt").toString,
      maxBytesPerTrigger = Some(1L))
    val off3 = stream3.latestOffset(null,
      stream3.getDefaultReadLimit).asInstanceOf[ColumnFileOffset]
    // batch 0 = the real file alone (the 0-byte one is not data)
    assert(off3 == ColumnFileOffset(1L))
    assert(stream3.planInputPartitions(ColumnFileOffset(0L), off3).length == 1)
    assert(stream3.latestOffset(null, stream3.getDefaultReadLimit) == off3,
      "zero-length file kept re-surfacing")
  }

  test("non-positive or malformed rate-limit options fail loudly, not stall") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream-badopt").toString
    Seq((1L, "a")).toDF("id", "v").write.format("columnfile")
      .mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema
    for (bad <- Seq("0", "-3", "abc")) {
      val e = intercept[Exception] {
        val q = spark.readStream.format("columnfile").schema(schema)
          .option("maxFilesPerTrigger", bad).load(src)
          .writeStream.format("noop")
          .option("checkpointLocation",
            Files.createTempDirectory("cf-badopt-ckpt").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("maxFilesPerTrigger")),
        s"'$bad' produced: ${msgs(e).mkString(" | ")}")
    }
  }

  test("cf stream composes with watermarked aggregation and ingest dedup end-to-end") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-stream2-src").toString
    val ckpt = Files.createTempDirectory("cf-stream2-ckpt").toString

    def ts(minute: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")
    // batch 1 with an in-batch duplicate event_id
    Seq((1L, ts(5), 1L, "click", 1.0), (1L, ts(5), 1L, "click", 1.0),
      (2L, ts(20), 2L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema

    val sinkDir = Files.createTempDirectory("cf-stream2-sink").toString
    val stream = spark.readStream.format("columnfile").schema(schema).load(src)
    val counts = graft.streaming.EventStreams.hourlyCounts(
      graft.streaming.EventStreams.dedupByIds(stream, "30 minutes", "event_id"),
      watermarked = true)
    def runOnce(): Unit = {
      val q = counts.writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()

    // re-delivered id 1 in a later file + a watermark-advancing event
    Seq((1L, ts(25), 1L, "click", 1.0), (9L, ts(300), 3L, "view", 0.1))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.format("columnfile").mode("append").save(src)
    runOnce()
    // one more batch: with two stateful operators the watermark advanced
    // at the END of the previous batch, so the closed window emits here
    Seq((10L, ts(600), 3L, "view", 0.1))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.format("columnfile").mode("append").save(src)
    runOnce()

    // hour 0 window is watermark-complete: duplicates of id 1 dropped
    // (both the same-batch copy and the cross-file re-delivery)
    val rows = spark.read.parquet(sinkDir)
      .filter(col("h") === ts(0))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("click", 2L, 300L)))
  }
}
