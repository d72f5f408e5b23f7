package graft.spark

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `_manifest.json` maintained by every commit path; `useManifest=true`
  * plans from it with zero directory listings (proof: a stray data file
  * planted behind the engine's back is invisible to a manifest read and
  * visible to a walk).
  */
class ManifestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("manifest-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("commits maintain the manifest; useManifest plans without listing") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-manifest").toString
    (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2).write.format("columnfile").mode("overwrite").save(dir)

    val conf = new Configuration()
    val entries = ManifestFile.read(conf, new Path(dir)).get
    val listed = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension))
    assert(entries.map(_.rel).sorted.toSeq == listed.map(_.getName).sorted.toSeq)
    assert(entries.forall(e => e.len > 0 && e.mtime > 0))

    // plant a stray data file the engine didn't commit: a walk sees it,
    // the manifest doesn't — proof planning never listed the directory
    val src = listed.head
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(dir, "stray-copy.cf").toPath)
    val walked = spark.read.format("columnfile").load(dir).count()
    val viaManifest = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).count()
    assert(walked > 1000, s"stray file not visible to the walk: $walked")
    assert(viaManifest == 1000, s"manifest read listed the directory")

    // append merges instead of replacing
    new java.io.File(dir, "stray-copy.cf").delete()
    (1000 until 1200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("append").save(dir)
    val after = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir)
    assert(after.count() == 1200)
    assert(after.agg(org.apache.spark.sql.functions.max("id")).head.getLong(0) == 1199L)

    // stats-only aggregate pushdown also plans from the manifest
    val agg = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(agg.head.getLong(0) == 1200L)

    // a malformed manifest falls back to the walk, never breaks reads
    java.nio.file.Files.write(
      new java.io.File(dir, ManifestFile.Name).toPath, "garbage{".getBytes)
    assert(spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).count() == 1200)

    // an append over a corrupt manifest must NOT rebuild it from only
    // the new files (readers would silently miss old data) — it
    // re-bootstraps the COMPLETE listing from a directory walk, so the
    // table is manifest-complete again after the commit
    (1200 until 1300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("append").save(dir)
    val healed = ManifestFile.read(conf, new Path(dir)).get
    assert(spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).count() == 1300)
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension))
    assert(healed.map(_.rel).sorted.toSeq == onDisk.map(_.getName).sorted.toSeq,
      "healed manifest must cover every data file")

    // same self-heal for a LEGACY table that predates the manifest
    new java.io.File(dir, ManifestFile.Name).delete()
    (1300 until 1350).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("append").save(dir)
    assert(spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).count() == 1350,
      "append to a manifest-less table must bootstrap the full listing")
  }

  test("manifest publish is atomic: temp+rename, no leftover temp, rewrite over existing") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-manifest-atomic").toString
    val conf = new Configuration()
    val root = new Path(dir)

    ManifestFile.write(conf, root,
      Seq(ManifestFile.Entry("a.cf", 1L, 10L)))
    // overwrite an EXISTING manifest (Hadoop rename refuses an existing
    // destination — the delete+rename path must handle it)
    ManifestFile.write(conf, root,
      Seq(ManifestFile.Entry("a.cf", 1L, 10L),
        ManifestFile.Entry("b.cf", 2L, 20L)))
    assert(ManifestFile.read(conf, root).get.map(_.rel).sorted ==
      Seq("a.cf", "b.cf"))
    val leftovers = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp files survive publish: $leftovers")
    // the temp name is dot-prefixed: invisible to data-file listings even
    // if a crash strands it
    assert(s".${ManifestFile.Name}.tmp".startsWith("."))
  }

  test("racing committers cannot lose manifest entries (fence + validated merge)") {
    val dir = Files.createTempDirectory("cf-manifest-race").toString
    val conf = new Configuration()
    val root = new Path(dir)
    val threads = 4
    val commitsPerThread = 10
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        try {
          start.await()
          (0 until commitsPerThread).foreach { k =>
            ManifestFile.append(conf, root,
              Seq(ManifestFile.Entry(s"t$t-c$k.cf", t * 1000L + k, k.toLong)))
          }
        } catch { case e: Throwable => errs.add(e); () }
      })
    }
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"racing commit threw: ${errs.peek()}")
    val finalRels = ManifestFile.read(conf, root).get.map(_.rel).toSet
    val expected = (for (t <- 0 until threads; k <- 0 until commitsPerThread)
      yield s"t$t-c$k.cf").toSet
    assert(finalRels == expected,
      s"lost ${expected.diff(finalRels).size} entries to the race: " +
        expected.diff(finalRels).take(5))
    // the lock is released afterwards
    assert(!new java.io.File(dir, ManifestFile.LockName).exists())
  }

  test("an abandoned (stale) manifest lock is broken, not waited on forever") {
    val dir = Files.createTempDirectory("cf-manifest-stale").toString
    val conf = new Configuration()
    val root = new Path(dir)
    val lock = new java.io.File(dir, ManifestFile.LockName)
    assert(lock.createNewFile())
    // backdate past the staleness threshold: a crashed committer's leftovers
    assert(lock.setLastModified(
      System.currentTimeMillis() - ManifestFile.LockStaleMs - 60000L))
    ManifestFile.append(conf, root,
      Seq(ManifestFile.Entry("after-crash.cf", 1L, 1L)))
    assert(ManifestFile.read(conf, root).get.map(_.rel) == Seq("after-crash.cf"))
    assert(!lock.exists(), "stale lock must be cleaned up")
  }

  test("partitioned and streaming commits keep the manifest complete") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-manifest-part").toString
    (0 until 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
      .repartition(1).write.format("columnfile").partitionBy("g")
      .mode("overwrite").save(dir)
    val conf = new Configuration()
    val entries = ManifestFile.read(conf, new Path(dir)).get
    assert(entries.nonEmpty && entries.forall(_.rel.startsWith("g=")))
    val viaManifest = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir)
    assert(viaManifest.count() == 300)
    assert(viaManifest.filter(org.apache.spark.sql.functions.col("g") === "g1")
      .count() == 100)

    // streaming sink: each committed epoch lands in the manifest
    val src = Files.createTempDirectory("cf-manifest-ssrc").toString
    val ckpt = Files.createTempDirectory("cf-manifest-sckpt").toString
    val sink = Files.createTempDirectory("cf-manifest-sout").toString
    (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema
    val q = spark.readStream.format("columnfile").schema(schema).load(src)
      .writeStream.format("columnfile")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.format("columnfile")
      .option("useManifest", "true").load(sink).count() == 50)
    val sinkEntries = ManifestFile.read(conf, new Path(sink)).get
    assert(sinkEntries.nonEmpty &&
      sinkEntries.forall(!_.rel.startsWith(".")), sinkEntries.toString)
  }

  test("the sort-order claim rides the manifest: useManifest readers " +
    "discover it with zero non-manifest metadata reads, and a legacy " +
    "files-only manifest falls back to the sidecar stamp") {
    val sp = spark; import sp.implicits._
    def sortsIn(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.length
    val dir = Files.createTempDirectory("cf-manifest-sort").toString
    (0 until 3000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.format("columnfile").option("sortedBy", "id")
      .option("targetChunkBytes", "4096").mode("overwrite").save(dir)
    val conf = new Configuration()
    val root = new Path(dir)
    assert(ManifestFile.readOrder(conf, root).contains(Seq("id")),
      "the commit must embed the verified claim in the manifest")
    // delete the sidecar stamp: the manifest ALONE must carry the claim
    // for useManifest readers — proof that planning a stamped manifest
    // table does zero non-manifest metadata RPCs
    assert(new java.io.File(dir, SortOrderStamp.Name).delete())
    val viaManifest = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).sortWithinPartitions("id")
    assert(sortsIn(viaManifest) == 0,
      s"manifest-carried claim should elide the sort:\n" +
        viaManifest.queryExecution.executedPlan)
    assert(viaManifest.count() == 3000)
    // a walk-mode reader consults only the (deleted) sidecar: no claim,
    // real sort — the manifest, not a stray sidecar read, carried it
    val walked = spark.read.format("columnfile").load(dir)
      .sortWithinPartitions("id")
    assert(sortsIn(walked) > 0)
    // LEGACY manifest (round-19 shape, files only) + sidecar stamp:
    // discovery falls back to the sidecar instead of dropping a
    // truthful claim
    val mf = new java.io.File(dir, ManifestFile.Name)
    val body = new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
    val legacy = body.replaceAll(""","sort":\[[^]]*\]""", "")
    assert(legacy != body, "fixture: manifest should have carried a claim")
    java.nio.file.Files.write(mf.toPath, legacy.getBytes("UTF-8"))
    SortOrderStamp.write(conf, root, Seq("id"))
    val viaLegacy = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).sortWithinPartitions("id")
    assert(sortsIn(viaLegacy) == 0,
      "legacy manifest must fall back to the sidecar stamp")
    // an unstamped append clears the claim in BOTH carriers atomically
    Seq((99999L, "tail")).toDF("id", "v")
      .write.format("columnfile").mode("append").save(dir)
    assert(ManifestFile.readOrder(conf, root).contains(Seq.empty),
      "the manifest claim must read as authoritative no-claim")
    assert(SortOrderStamp.read(conf, root).isEmpty)
    val after = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir).sortWithinPartitions("id")
    assert(sortsIn(after) > 0)
  }

  test("the manifest's claim is authoritative over a stray sidecar " +
    "stamp: a sortedBy append onto a manifest-cleared table cannot " +
    "resurrect a claim over files it did not write") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-manifest-stray").toString
    val conf = new Configuration()
    val root = new Path(dir)
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.format("columnfile").option("sortedBy", "id")
      .mode("overwrite").save(dir)
    // a plain append clears the claim in both carriers...
    (0 until 50).map(i => (((i * 13) % 50).toLong, s"u$i")).toDF("id", "v")
      .coalesce(1).write.format("columnfile").mode("append").save(dir)
    assert(ManifestFile.readOrder(conf, root).contains(Seq.empty))
    // ...simulate the racing-committer leftover: a stray sidecar stamp
    // reappears (hand-edit / interleaved clear) while the manifest's
    // authoritative no-claim stands
    SortOrderStamp.write(conf, root, Seq("id"))
    // a sortedBy append must consult the MANIFEST's prior claim (read
    // under the commit lock), not the stray sidecar: the table holds
    // unvouched unsorted files, so no claim may be published
    (200 until 220).map(i => (i.toLong, s"w$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.format("columnfile").option("sortedBy", "id")
      .mode("append").save(dir)
    assert(ManifestFile.readOrder(conf, root).contains(Seq.empty),
      "the stray sidecar must not resurrect a claim through the append")
    assert(SortOrderStamp.read(conf, root).isEmpty,
      "the commit must clear the stray sidecar, not republish it")
    // and the reader pays its sort (no false zero-sort plan)
    val q = spark.read.format("columnfile").load(dir)
      .sortWithinPartitions("id")
    assert(q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.nonEmpty)
  }

  test("streaming source can plan triggers from the manifest alone") {
    val sp = spark; import sp.implicits._
    val src = Files.createTempDirectory("cf-manifest-stsrc").toString
    val ckpt = Files.createTempDirectory("cf-manifest-stckpt").toString
    val out = Files.createTempDirectory("cf-manifest-stout").toString
    (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(src)
    val schema = spark.read.format("columnfile").load(src).schema
    def runOnce(): Unit = {
      val q = spark.readStream.format("columnfile").schema(schema)
        .option("useManifest", "true").load(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 40)
    // a stray file is invisible to the manifest-driven stream...
    val data = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension)).head
    java.nio.file.Files.copy(data.toPath,
      new java.io.File(src, "zz-stray.cf").toPath)
    runOnce()
    assert(spark.read.parquet(out).count() == 40, "stray file was listed")
    new java.io.File(src, "zz-stray.cf").delete()
    // ...while committed appends (which update the manifest) are picked up
    (40 until 55).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).write.format("columnfile").mode("append").save(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 55)
  }
}
