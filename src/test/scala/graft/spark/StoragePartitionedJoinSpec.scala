package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two columnfile tables Hive-partitioned on
  * the join column report KeyGroupedPartitioning with per-split keys, so
  * Spark joins them without any shuffle exchange.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("spj-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("join on the partition column runs with zero shuffle exchanges") {
    val sp = spark; import sp.implicits._
    val dirA = Files.createTempDirectory("cf-spj-a").toString
    val dirB = Files.createTempDirectory("cf-spj-b").toString
    (0 until 3000).map(i => (i.toLong, s"g${i % 8}", i * 2.0))
      .toDF("id", "g", "x")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirA)
    (0 until 800).map(i => (i.toLong, s"g${i % 8}", s"n$i"))
      .toDF("bid", "g", "name")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirB)

    val a = spark.read.format("columnfile").load(dirA)
    val b = spark.read.format("columnfile").load(dirB)
    val joined = a.join(b, "g")
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sx"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinPart = plan.linesIterator.takeWhile(!_.contains("HashAggregate")).mkString("\n")
    // the join itself must consume the scans directly: no Exchange between
    // the sorts/join and the two BatchScans
    val exchangesBelowAgg = plan.linesIterator
      .dropWhile(l => !l.contains("SortMergeJoin"))
      .count(_.contains("Exchange"))
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(exchangesBelowAgg == 0,
      s"expected shuffle-free storage-partitioned join:\n$plan")

    // correctness vs the same join over parquet
    val pa = (0 until 3000).map(i => (i.toLong, s"g${i % 8}", i * 2.0))
      .toDF("id", "g", "x")
    val pb = (0 until 800).map(i => (i.toLong, s"g${i % 8}", s"n$i"))
      .toDF("bid", "g", "name")
    val expect = pa.join(pb, "g").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("x").as("sx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val got = joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == expect.toSeq)
  }

  test("storage-partitioned join stays exchange-free with AQE enabled") {
    val sp = spark; import sp.implicits._
    val dirA = Files.createTempDirectory("cf-spj-aqe-a").toString
    val dirB = Files.createTempDirectory("cf-spj-aqe-b").toString
    (0 until 1000).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirA)
    (0 until 200).map(i => (i.toLong, s"g${i % 4}")).toDF("bid", "g")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirB)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val a = spark.read.format("columnfile").load(dirA)
      val b = spark.read.format("columnfile").load(dirB)
      val joined = a.join(b, "g").groupBy("g").count()
      val n = joined.collect().map(_.getLong(1)).sum // execute under AQE
      assert(n == 250L * 50L * 4L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      val joinSection = finalPlan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(finalPlan.contains("SortMergeJoin"), s"expected SMJ:\n$finalPlan")
      assert(!joinSection.contains("Exchange"),
        s"AQE reintroduced a shuffle below the join:\n$finalPlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  test("non-partitioned scans still plan and join normally") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-spj-c").toString
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(dir)
    val t = spark.read.format("columnfile").load(dir)
    assert(t.join(t.select(col("id").as("id2")), col("id") === col("id2"))
      .count() == 100)
  }
}
