package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class AggPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("agg-pushdown-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("count/min/max answered from stats sidecars, plan shows stats-only scan") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-agg").toString
    sp.sql(
      """SELECT id,
        |  CASE WHEN id % 4 = 0 THEN NULL ELSE id * 2 END AS v,
        |  concat('s', lpad(CAST(id AS STRING), 5, '0')) AS s,
        |  CAST(id AS DOUBLE) / 8 AS d
        |FROM range(10000)""".stripMargin)
      .repartition(3)
      .write.format("columnfile").option("targetChunkBytes", "16384")
      .mode("overwrite").save(dir)

    val t = spark.read.format("columnfile").load(dir)
    val agg = t.agg(
      count(lit(1)), count(col("v")), min(col("id")), max(col("id")),
      min(col("s")), max(col("s")), min(col("d")), max(col("d")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("stats-only aggregate"),
      s"expected stats-only scan in plan:\n$plan")
    val r = agg.head
    assert(r.getLong(0) == 10000)
    assert(r.getLong(1) == 7500) // 2500 ids with id%4==0 are null
    assert(r.getLong(2) == 0 && r.getLong(3) == 9999)
    assert(r.getString(4) == "s00000" && r.getString(5) == "s09999")
    assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 9999.0 / 8)
  }

  test("SUM over integral columns answered from stats; floats/overflow fall back") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-agg-sum").toString
    sp.sql(
      """SELECT id,
        |  CASE WHEN id % 4 = 0 THEN NULL ELSE id * 2 END AS v,
        |  CAST(id % 100 AS INT) AS small,
        |  CAST(id AS DOUBLE) / 8 AS d,
        |  CAST(NULL AS BIGINT) AS allnull
        |FROM range(10000)""".stripMargin)
      .repartition(3)
      .write.format("columnfile").option("targetChunkBytes", "16384")
      .mode("overwrite").save(dir)
    val t = spark.read.format("columnfile").load(dir)

    val agg = t.agg(sum(col("id")), sum(col("v")), sum(col("small")),
      count(lit(1)), sum(col("allnull")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("stats-only aggregate"),
      s"expected stats-only SUM in plan:\n$plan")
    val r = agg.head
    assert(r.getLong(0) == (0L until 10000L).sum)
    assert(r.getLong(1) == (0L until 10000L).filter(_ % 4 != 0).map(_ * 2).sum)
    assert(r.getLong(2) == (0L until 10000L).map(_ % 100).sum)
    assert(r.getLong(3) == 10000L)
    assert(r.isNullAt(4), "SUM of an all-null column must be NULL")

    // double SUM: order-dependent addition — must NOT be stats-answered
    val dAgg = t.agg(sum(col("d")))
    assert(!dAgg.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(dAgg.head.getDouble(0) == (0L until 10000L).map(_.toDouble / 8).sum)

    // near-overflow values: the chunk sum overflows, pushdown bails, and
    // the query behaves exactly like vanilla Spark — under default ANSI
    // mode that is an ARITHMETIC_OVERFLOW error from the scan, not a
    // silently wrong stats answer
    val big = Files.createTempDirectory("cf-agg-sum-ovf").toString
    Seq(Long.MaxValue - 5, 10L, -7L).toDF("x")
      .repartition(1).write.format("columnfile").mode("overwrite").save(big)
    val bAgg = spark.read.format("columnfile").load(big).agg(sum(col("x")))
    assert(!bAgg.queryExecution.executedPlan.toString.contains("stats-only"),
      "overflowing sum must not be stats-answered")
    val ovf = intercept[Exception] { bAgg.head }
    assert(ovf.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      Option(ovf.getCause).exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")),
      s"expected Spark's own overflow error, got: ${ovf.getMessage}")

    // grouped-by-partition variant carries sums too
    val pdir = Files.createTempDirectory("cf-agg-sum-part").toString
    (0 until 900).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(pdir)
    val gAgg = spark.read.format("columnfile").load(pdir)
      .groupBy("g").agg(sum(col("id")).as("s")).orderBy("g")
    assert(gAgg.queryExecution.executedPlan.toString.contains("stats-only"),
      "partition-grouped SUM should be stats-only")
    val expected = (0 until 900).groupBy(i => s"g${i % 3}").toSeq.sortBy(_._1)
      .map { case (g, is) => (g, is.map(_.toLong).sum) }
    assert(gAgg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == expected)
  }

  test("no pushdown with filters or group-by; results still correct") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-agg2").toString
    (0 until 1000).map(i => (i.toLong, i % 5)).toDF("id", "g")
      .write.format("columnfile").mode("overwrite").save(dir)
    val t = spark.read.format("columnfile").load(dir)

    val filtered = t.filter(col("id") >= 500).agg(count(lit(1)), max(col("id")))
    assert(!filtered.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(filtered.head.toSeq == Seq(500L, 999L))

    val grouped = t.groupBy("g").agg(count(lit(1)).as("n")).orderBy("g")
    assert(!grouped.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(grouped.collect().map(_.getLong(1)).forall(_ == 200L))
  }

  test("GROUP BY partition column answered from sidecars; global agg on partitioned table too") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-agg-grp").toString
    (0 until 3000).map(i => (i.toLong, s"g${i % 4}", i % 7))
      .toDF("id", "g", "v")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dir)
    val t = spark.read.format("columnfile").load(dir)

    val grouped = t.groupBy("g")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy("g")
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("stats-only aggregate"),
      s"expected stats-only grouped plan:\n$plan")
    val rows = grouped.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 4)
    assert(rows.forall(_._2 == 750L))
    assert(rows.map(_._1).toSeq == Seq("g0", "g1", "g2", "g3"))
    assert(rows.find(_._1 == "g0").get._3 == 0L)
    assert(rows.find(_._1 == "g3").get._4 == 2999L)

    // global aggregate over a partitioned table: also metadata-only
    val global = t.agg(count(lit(1)), min("id"), max("id"))
    assert(global.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(global.head.toSeq == Seq(3000L, 0L, 2999L))

    // grouping by a NON-partition column must fall back to a real scan
    val byData = t.groupBy("v").agg(count(lit(1)).as("n"))
    assert(!byData.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(byData.collect().map(_.getLong(1)).sum == 3000L)
  }

  test("all-null column min/max is null; missing sidecar disables pushdown") {
    val sp = spark
    val dir = Files.createTempDirectory("cf-agg3").toString
    sp.sql("SELECT id, CAST(NULL AS BIGINT) AS nv FROM range(100)")
      .write.format("columnfile").mode("overwrite").save(dir)
    val t = spark.read.format("columnfile").load(dir)
    val r = t.agg(min(col("nv")), max(col("nv")), count(col("nv"))).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L)

    // remove sidecars: falls back to real scan, same answers
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(ChunkStatsIndex.Suffix)).foreach(_.delete())
    val t2 = spark.read.format("columnfile").load(dir)
    val agg2 = t2.agg(count(lit(1)), min(col("id")))
    assert(!agg2.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(agg2.head.toSeq == Seq(100L, 0L))
  }
}
