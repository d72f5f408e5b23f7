package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** INSERT OVERWRITE semantics: by-filter (static partition spec /
  * overwrite(condition)) and dynamic partition overwrite. Victims are
  * deleted at COMMIT from exact partition-filter evaluation
  * ([[PartitionFilterEval]]) — never from pruning approximations.
  */
class OverwriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("overwrite-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mkTable(name: String): String = {
    val dir = Files.createTempDirectory("cf-ovw").toString
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name (id BIGINT, v STRING, lang STRING) " +
        s"USING columnfile PARTITIONED BY (lang) OPTIONS (path '$dir')")
    spark.sql(
      s"INSERT INTO $name SELECT id, concat('v', id), " +
        "concat('l', id % 3) FROM range(300)")
    dir
  }

  private def dataFiles(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir)).map(_.getAbsolutePath).toSet
  }

  test("static partition overwrite replaces exactly that partition") {
    val dir = mkTable("cfo_static")
    val before = dataFiles(dir)
    val untouched = before.filterNot(_.contains("lang=l1"))
    spark.sql(
      "INSERT OVERWRITE cfo_static PARTITION (lang='l1') " +
        "SELECT id, 'rewritten' FROM range(5)")
    val after = dataFiles(dir)
    // untouched partitions keep their exact files; l1's old files are gone
    assert(untouched.subsetOf(after))
    assert(after.intersect(before.filter(_.contains("lang=l1"))).isEmpty)
    val t = spark.table("cfo_static")
    assert(t.filter(col("lang") === "l1").count() == 5)
    assert(t.filter(col("lang") === "l1" && col("v") === "rewritten").count() == 5)
    assert(t.filter(col("lang") === "l0").count() == 100)
    assert(t.filter(col("lang") === "l2").count() == 100)
    assert(t.count() == 205)
  }

  test("overwrite table with filterless INSERT OVERWRITE replaces everything") {
    mkTable("cfo_trunc")
    spark.sql("SET spark.sql.sources.partitionOverwriteMode=static")
    spark.sql(
      "INSERT OVERWRITE cfo_trunc SELECT id, 'new', concat('l', id % 2) " +
        "FROM range(10)")
    val t = spark.table("cfo_trunc")
    assert(t.count() == 10)
    assert(t.filter(col("v") === "new").count() == 10)
  }

  test("dynamic partition overwrite replaces only written partitions") {
    val dir = mkTable("cfo_dyn")
    val before = dataFiles(dir)
    val untouched = before.filterNot(_.contains("lang=l2"))
    withDynamicMode {
      // produces rows only for l2: l0/l1 must survive byte-identically
      spark.sql(
        "INSERT OVERWRITE cfo_dyn SELECT id, 'dyn', 'l2' FROM range(7)")
    }
    val after = dataFiles(dir)
    assert(untouched.subsetOf(after))
    assert(after.intersect(before.filter(_.contains("lang=l2"))).isEmpty)
    val t = spark.table("cfo_dyn")
    assert(t.filter(col("lang") === "l2").count() == 7)
    assert(t.filter(col("lang") === "l0").count() == 100)
    assert(t.filter(col("lang") === "l1").count() == 100)
  }

  private def withDynamicMode(body: => Unit): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try body finally spark.conf.set(key, prior)
  }

  test("manifest reflects the overwrite: useManifest read sees exact state") {
    val dir = mkTable("cfo_manifest")
    spark.sql(
      "INSERT OVERWRITE cfo_manifest PARTITION (lang='l0') " +
        "SELECT id, 'm' FROM range(3)")
    val viaManifest = spark.read.format("columnfile")
      .option("useManifest", "true").load(dir)
    val viaWalk = spark.read.format("columnfile").load(dir)
    assert(viaManifest.count() == viaWalk.count())
    assert(viaManifest.count() == 203)
    // manifest holds no stale victim entries: every listed file exists
    val conf = spark.sessionState.newHadoopConf()
    val entries = ManifestFile.read(conf, new org.apache.hadoop.fs.Path(dir)).get
    entries.foreach { e =>
      assert(new java.io.File(dir, e.rel).exists(), s"stale manifest entry ${e.rel}")
    }
  }

  test("non-partition filter overwrite is rejected, data untouched") {
    val sp = spark; import sp.implicits._
    val dir = mkTable("cfo_reject")
    val before = dataFiles(dir)
    val e = intercept[Exception] {
      Seq((1L, "r", "l0")).toDF("id", "v", "lang")
        .writeTo("cfo_reject").overwrite(col("id") < 10L)
    }
    assert(e.getMessage.contains("partition columns") ||
      e.getMessage.toLowerCase.contains("overwrite"))
    assert(dataFiles(dir) == before)
    assert(spark.table("cfo_reject").count() == 300)
  }

  test("overwrite by filter via DataFrameWriterV2 overwrite(condition)") {
    val sp = spark; import sp.implicits._
    val dir = mkTable("cfo_dfv2")
    Seq((1L, "w", "l1"), (2L, "w", "l1")).toDF("id", "v", "lang")
      .writeTo("cfo_dfv2").overwrite(col("lang") === "l1")
    val t = spark.table("cfo_dfv2")
    assert(t.filter(col("lang") === "l1").count() == 2)
    assert(t.count() == 202)
  }

  test("IN / multi-partition filters delete every matching partition") {
    mkTable("cfo_in")
    val sp = spark; import sp.implicits._
    Seq((9L, "multi", "l0")).toDF("id", "v", "lang")
      .writeTo("cfo_in").overwrite(col("lang").isin("l0", "l2"))
    val t = spark.table("cfo_in")
    assert(t.filter(col("lang") === "l0").count() == 1)
    assert(t.filter(col("lang") === "l2").count() == 0)
    assert(t.filter(col("lang") === "l1").count() == 100)
  }
}
