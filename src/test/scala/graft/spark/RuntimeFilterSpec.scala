package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic (runtime) filtering: join-key values from the dimension side
  * reach the columnfile scan at runtime and prune fact chunks through
  * the stats index.
  */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("runtime-filter-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("join-key runtime filter prunes and stays correct") {
    val sp = spark; import sp.implicits._
    val factDir = Files.createTempDirectory("cf-rt-fact").toString
    val dimDir = Files.createTempDirectory("cf-rt-dim").toString
    (0 until 100000).map(i => (i.toLong % 1000, s"payload_$i")).toDF("fk", "payload")
      .repartition(1).sortWithinPartitions("fk")
      .write.format("columnfile").option("targetChunkBytes", "16384")
      .mode("overwrite").save(factDir)
    (0 until 1000).map(i => (i.toLong, i % 50)).toDF("pk", "cat")
      .write.mode("overwrite").parquet(dimDir)

    val fact = spark.read.format("columnfile").load(factDir)
    val dim = spark.read.parquet(dimDir).filter(col("cat") === 7)
    val j = fact.join(dim, col("fk") === col("pk")).groupBy("cat").count()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime filter in plan:\n$plan")
    assert(j.collect().map(_.getLong(1)).sum == 2000L) // 20 keys x 100 rows
  }

  test("runtime filter composes with bloom pruning on an unsorted unique key") {
    val sp = spark; import sp.implicits._
    val factDir = Files.createTempDirectory("cf-rtb-fact").toString
    val dimDir = Files.createTempDirectory("cf-rtb-dim").toString
    // unique, hash-shuffled join key: every chunk's [min,max] spans the
    // domain, so ONLY the blooms can prune when the dim side's 3 surviving
    // keys arrive as a runtime In filter
    (0 until 50000).map(i => (i.toLong, s"payload_$i"))
      .sortBy { case (id, _) => ChunkStatsIndex.baseHashLong(id) }
      .toDF("id", "payload")
      .repartition(1)
      .write.format("columnfile")
      .option("targetChunkBytes", "16384").option("bloom", "id")
      .mode("overwrite").save(factDir)
    (0 until 50000 by 1000).map(i => (i.toLong, i % 7)).toDF("pk", "cat")
      .write.mode("overwrite").parquet(dimDir)

    val fact = spark.read.format("columnfile").load(factDir)
    val dim = spark.read.parquet(dimDir).filter(col("cat") === 3)
    val j = fact.join(dim, col("id") === col("pk"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime filter in plan:\n$plan")
    // pk = 1000n, cat = pk % 7 == 3  =>  6n ≡ 3 (mod 7)  =>  n ≡ 4 (mod 7)
    assert(j.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4000L, 11000L, 18000L, 25000L, 32000L, 39000L, 46000L))
  }
}
