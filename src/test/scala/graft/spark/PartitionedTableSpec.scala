package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout: partitionBy writes col=value dirs,
  * reads synthesize the partition columns, and partition predicates
  * prune whole directories before any I/O.
  */
class PartitionedTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("partitioned-table-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def writeSample(): String = {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-part").toString
    (0 until 10000).map(i => (i.toLong, i % 7, s"lang_${i % 3}", s"payload_$i"))
      .toDF("id", "bucket", "lang", "payload")
      .write.format("columnfile").partitionBy("bucket", "lang")
      .mode("overwrite").save(dir)
    dir
  }

  test("partitionBy writes col=value directories and a layout sidecar") {
    val dir = writeSample()
    val root = new java.io.File(dir)
    assert(new java.io.File(root, PartitionLayout.Sidecar).exists())
    val bucketDirs = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(bucketDirs.toSet == (0 until 7).map(i => s"bucket=$i").toSet)
    val langDirs = new java.io.File(root, "bucket=0").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(langDirs.toSet ==
      (0 until 3).map(i => s"lang=lang_$i").toSet)
  }

  test("read back: partition columns synthesized, values exact") {
    val dir = writeSample()
    val back = spark.read.format("columnfile").load(dir)
    assert(back.count() == 10000)
    assert(back.columns.toSet == Set("id", "bucket", "lang", "payload"))
    val bad = back.filter(
      col("bucket") =!= pmod(col("id"), lit(7)).cast("int") ||
      col("lang") =!= concat(lit("lang_"), pmod(col("id"), lit(3)).cast("string")))
    assert(bad.count() == 0)
    // aggregation over partition + data columns
    val agg = back.groupBy("bucket").agg(count(lit(1)).as("n"),
      sum("id").as("s")).orderBy("bucket").collect()
    assert(agg.length == 7 && agg.map(_.getLong(1)).sum == 10000)
  }

  test("partition predicate prunes directories at planning") {
    val dir = writeSample()
    def scan(c: org.apache.spark.sql.Column) =
      spark.read.format("columnfile").option("maxPartitionBytes", "1")
        .load(dir).filter(c)
    val all = scan(col("id") >= 0).rdd.getNumPartitions
    val one = scan(col("bucket") === 3).rdd.getNumPartitions
    assert(one * 5 <= all, s"dir pruning ineffective: $one of $all")
    assert(scan(col("bucket") === 3).count() ==
      (0 until 10000).count(_ % 7 == 3))
    // combined partition + data predicate
    val both = scan(col("bucket") === 3 && col("id") < 100)
    assert(both.collect().map(_.getLong(0)).sorted.toSeq ==
      (0 until 100).filter(_ % 7 == 3).map(_.toLong))
  }

  test("projections: data-only, partition-only, and count(*)") {
    val dir = writeSample()
    val t = spark.read.format("columnfile").load(dir)
    assert(t.select("payload").count() == 10000)
    val langs = t.select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(langs.toSeq == Seq("lang_0", "lang_1", "lang_2"))
    assert(t.count() == 10000)
    assert(t.groupBy("lang").count().collect().map(_.getLong(1)).forall(n =>
      n > 3000 && n < 3500))
  }
}
