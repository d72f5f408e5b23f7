package graft.spark

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Row-level DELETE (`SupportsDelete.deleteWhere`): partition truncate
  * for partition-complete predicates, stats-directed distributed
  * chunk-rewrite on unpartitioned tables (the reference's
  * recompress-copy shape, tools/columnfile-cat.cc:328-341), loud
  * rejection otherwise.
  */
class DeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("delete-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(
      spark.sessionState.functionRegistry)
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("partition-complete DELETE truncates exactly the matching " +
    "partitions' files; untouched files stay byte-identical") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-del-part").toString
    spark.sql("DROP TABLE IF EXISTS cfdel_p")
    spark.sql(
      s"CREATE TABLE cfdel_p (id BIGINT, v STRING, lang STRING) " +
        s"USING columnfile PARTITIONED BY (lang) OPTIONS (path '$dir')")
    spark.sql(
      "INSERT INTO cfdel_p SELECT id, concat('v', id), " +
        "concat('l', id % 3) FROM range(300)")
    val before = dataFiles(dir)
    val untouched = before.filterNot(_._1.contains("lang=l1"))
    spark.sql("DELETE FROM cfdel_p WHERE lang = 'l1'")
    val after = dataFiles(dir)
    assert(untouched.toSet.subsetOf(after.toSet),
      "non-matching partitions must keep their exact files")
    assert(!after.keys.exists(_.contains("lang=l1")))
    assert(spark.table("cfdel_p").count() == 200)
    assert(spark.table("cfdel_p").where("lang = 'l1'").count() == 0)
    // manifest swapped atomically with the deletion
    assert(spark.read.format("columnfile").option("useManifest", "true")
      .load(dir).count() == 200)
  }

  test("row-level DELETE on an unpartitioned table is a STATS-DIRECTED " +
    "rewrite: provably-unaffected files are not touched, matching rows " +
    "are gone, NULL-predicate rows are kept") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-del-row").toString
    // doc-ordered, many small files => chunk stats prove most files
    // untouched by an id-range delete
    (0 until 10).foreach { k =>
      (k * 100 until (k + 1) * 100)
        .map(i => (i.toLong, if (i % 10 == 0) null else s"v$i"))
        .toDF("id", "v").coalesce(1).sortWithinPartitions("id")
        .write.format("columnfile")
        .mode(if (k == 0) "overwrite" else "append").save(dir)
    }
    spark.sql("DROP TABLE IF EXISTS cfdel_r")
    spark.sql(s"CREATE TABLE cfdel_r (id BIGINT, v STRING) " +
      s"USING columnfile OPTIONS (path '$dir')")
    val before = dataFiles(dir)
    // delete ids [250, 340): touches exactly the files holding 200-299
    // and 300-399
    spark.sql("DELETE FROM cfdel_r WHERE id >= 250 AND id < 340")
    val after = dataFiles(dir)
    val survivors = before.filter { case (p, m) =>
      after.get(p).contains(m) }
    assert(survivors.size == 8,
      s"stats should prove 8 of 10 files untouched; survived: " +
        s"${survivors.size}")
    assert(spark.table("cfdel_r").count() == 1000 - 90)
    assert(spark.table("cfdel_r").where("id >= 250 AND id < 340").count() == 0)
    assert(spark.table("cfdel_r").where("id = 249").count() == 1)
    assert(spark.table("cfdel_r").where("id = 340").count() == 1)
    // NULL-predicate rows survive (SQL DELETE removes only TRUE rows)
    spark.sql("DELETE FROM cfdel_r WHERE v < 'v1'")
    assert(spark.table("cfdel_r").where("v IS NULL").count() > 0,
      "rows where the predicate is NULL must be kept")
    // manifest readers see the post-delete table
    assert(spark.read.format("columnfile").option("useManifest", "true")
      .load(dir).count() == spark.table("cfdel_r").count())
  }

  test("DELETE without WHERE truncates the table") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-del-all").toString
    (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(dir)
    spark.sql("DROP TABLE IF EXISTS cfdel_t")
    spark.sql(s"CREATE TABLE cfdel_t (id BIGINT, v STRING) " +
      s"USING columnfile OPTIONS (path '$dir')")
    spark.sql("DELETE FROM cfdel_t")
    assert(spark.table("cfdel_t").count() == 0)
    assert(dataFiles(dir).isEmpty)
  }

  test("partitioned row-level DELETE: partition conjuncts prune " +
    "directories exactly, data conjuncts rewrite only stats-admitted " +
    "files in place; a MIXED conjunct is rejected loudly") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-del-prow").toString
    spark.sql("DROP TABLE IF EXISTS cfdel_prow")
    spark.sql(
      s"CREATE TABLE cfdel_prow (id BIGINT, v STRING, lang STRING) " +
        s"USING columnfile PARTITIONED BY (lang) OPTIONS (path '$dir')")
    // per (lang, block): one doc-ordered file => chunk stats admit
    // exactly the file holding the deleted range
    for (l <- 0 until 2; k <- 0 until 5) {
      (k * 100 until (k + 1) * 100)
        .map(i => (i.toLong, s"v$i", s"l$l")).toDF("id", "v", "lang")
        .coalesce(1).sortWithinPartitions("id")
        .write.format("columnfile").partitionBy("lang")
        .mode("append").save(dir)
    }
    val before = dataFiles(dir)
    spark.sql(
      "DELETE FROM cfdel_prow WHERE lang = 'l1' AND id >= 250 AND id < 340")
    val after = dataFiles(dir)
    // l0 untouched entirely; l1's files outside [200,400) untouched
    val survivors = before.filter { case (p, m) => after.get(p).contains(m) }
    assert(before.keys.filter(_.contains("lang=l0"))
      .forall(survivors.contains), "l0 must be untouched")
    assert(survivors.count(_._1.contains("lang=l1")) == 3,
      s"stats should prove 3 of 5 l1 files untouched; survived " +
        s"${survivors.count(_._1.contains("lang=l1"))}")
    assert(spark.table("cfdel_prow").count() == 1000 - 90)
    assert(spark.table("cfdel_prow")
      .where("lang = 'l1' AND id >= 250 AND id < 340").count() == 0)
    assert(spark.table("cfdel_prow")
      .where("lang = 'l0' AND id >= 250 AND id < 340").count() == 90,
      "the other partition keeps its rows")
    // rewritten rows stay in their partition directory; manifest
    // readers see the post-delete table
    assert(spark.read.format("columnfile").option("useManifest", "true")
      .load(dir).where("lang = 'l1'").count() == 500 - 90)
    // a conjunct MIXING partition and data columns is not per-file
    // decidable: rejected with zero partial effects
    val ex = intercept[Exception] {
      spark.sql("DELETE FROM cfdel_prow WHERE lang = 'l0' OR id = 450")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).nonEmpty)
    assert(spark.table("cfdel_prow").count() == 910, "no partial delete")
  }

  test("a rewrite re-applies the table's own creation options: the " +
    "rewritten files keep their per-chunk blooms instead of being " +
    "silently stripped to defaults") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-del-opts").toString
    spark.sql("DROP TABLE IF EXISTS cfdel_opts")
    spark.sql(
      s"CREATE TABLE cfdel_opts (id BIGINT, v STRING) USING columnfile " +
        s"OPTIONS (path '$dir', bloom 'id', dictionary 'true')")
    // seed the table through the path API WITH the options (catalog
    // INSERT option propagation is a separate concern; the delete must
    // preserve whatever the files carry)
    (0 until 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.format("columnfile").option("bloom", "id")
      .option("dictionary", "true").mode("overwrite").save(dir)
    val conf = new Configuration()
    def bloomed(d: String): Boolean = {
      val files = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension))
      files.nonEmpty && files.forall { f =>
        ChunkStatsIndex.readWithLen(conf,
          new Path(f.getAbsolutePath)).exists(_._2.forall(_.blooms.nonEmpty))
      }
    }
    assert(bloomed(dir), "fixture: seed files must carry blooms")
    spark.sql("DELETE FROM cfdel_opts WHERE id >= 100 AND id < 200")
    assert(spark.table("cfdel_opts").count() == 1900)
    assert(bloomed(dir),
      "rewritten files must keep the table's bloom option")
  }

  test("q78 takedown survives maintain -> compact -> serve: no " +
    "taken-down id in any family's compacted artifact, and a re-upload " +
    "in a later delta cannot resurrect it through the next compaction") {
    val sp = spark; import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    def tdPred(id: String) =
      s"(($id >= 100 AND $id < 140) OR $id % 31 = 7)"
    // run the real pipeline (builds the three families' maintained
    // state, applies the takedown, compacts, probes)
    graft.queries.Tables.registerAll(spark, dir)
    val out = graft.queries.ExtQueries.takedownCompactDF(spark, dir)
    assert(out.count() > 0)
    // the takedown did real work: the PRE-takedown maintained state
    // held taken-down ids in every family
    val preInv = spark.read.format("columnfile")
      .load(graft.queries.Tables.cachePath(dir, "inv_base_even"))
    assert(preInv.where(tdPred("doc_id")).count() > 0)
    assert(spark.table("q68_idx").where(tdPred("vec_id")).count() > 0)
    // ...and no compacted artifact holds a single one
    val artifacts = Seq(
      ("q78_inv_compacted", "doc_id"),
      ("q78_shards_compacted", "doc_id"),
      ("q78_ivf_compacted", "vec_id"))
    artifacts.foreach { case (name, idCol) =>
      val t = spark.read.format("columnfile")
        .load(graft.queries.Tables.cachePath(dir, name))
      assert(t.where(tdPred(idCol)).count() == 0,
        s"$name resurrects taken-down ids")
      assert(t.count() > 0, s"$name must still hold the complement")
    }
    // RESURRECTION leg: a later maintenance wave re-uploads a
    // taken-down doc's postings; the next compaction anti-joins the
    // DURABLE takedown relation, so the doc stays gone while the
    // wave's legitimate rows land
    val td = spark.read.format("columnfile")
      .load(graft.queries.Tables.cachePath(dir, "q78_takedown"))
    val compacted = spark.read.format("columnfile")
      .load(graft.queries.Tables.cachePath(dir, "q78_inv_compacted"))
      .selectExpr("doc_id", "w", "tf", "CAST(tb AS INT) AS tb")
    val reupload = Seq(
      (100L, "hash", 1L, 0), // taken-down id arriving again
      (9001L, "hash", 2L, 0) // a legitimate new doc
    ).toDF("doc_id", "w", "tf", "tb")
    val wave2 = compacted.union(reupload)
    val compact2 = wave2.join(td, wave2("doc_id") === td("id"), "left_anti")
    assert(compact2.where("doc_id = 100").count() == 0,
      "a re-upload must not resurrect a taken-down doc")
    assert(compact2.where("doc_id = 9001").count() == 1,
      "legitimate wave-2 rows must land")
  }

  test("sort-order claims: preserved by partition truncate, cleared " +
    "by a row-level rewrite") {
    val sp = spark; import sp.implicits._
    val conf = new Configuration()
    // partition truncate preserves the claim (whole-file victims)
    val dirA = Files.createTempDirectory("cf-del-sa").toString
    for (g <- 0 until 3) {
      (0 until 200).map(i => (s"g$g", i.toLong)).toDF("g", "id")
        .coalesce(1).sortWithinPartitions("id")
        .write.format("columnfile").partitionBy("g")
        .option("sortedBy", "id")
        .mode(if (g == 0) "overwrite" else "append").save(dirA)
    }
    assert(SortOrderStamp.read(conf, new Path(dirA)).contains(Seq("id")))
    ColumnFileDelete.delete(Seq(dirA),
      spark.read.format("columnfile").load(dirA).schema, conf, Seq("g"),
      Array(org.apache.spark.sql.sources.EqualTo("g", "g1")))
    assert(SortOrderStamp.read(conf, new Path(dirA)).contains(Seq("id")),
      "whole-file deletion must keep the verified claim")
    assert(ManifestFile.readOrder(conf, new Path(dirA)).contains(Seq("id")))
    assert(spark.read.format("columnfile").load(dirA).count() == 400)
    // row-level rewrite clears it (rewritten files carry no claim)
    val dirB = Files.createTempDirectory("cf-del-sb").toString
    (0 until 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.format("columnfile").option("sortedBy", "id")
      .mode("overwrite").save(dirB)
    assert(SortOrderStamp.read(conf, new Path(dirB)).contains(Seq("id")))
    ColumnFileDelete.delete(Seq(dirB),
      spark.read.format("columnfile").load(dirB).schema, conf, Seq.empty,
      Array(org.apache.spark.sql.sources.EqualTo("id", 17L)))
    assert(SortOrderStamp.read(conf, new Path(dirB)).isEmpty,
      "a rewrite must drop the claim (conservative)")
    assert(ManifestFile.readOrder(conf, new Path(dirB)).contains(Seq.empty))
    assert(spark.read.format("columnfile").load(dirB).count() == 499)
  }
}
