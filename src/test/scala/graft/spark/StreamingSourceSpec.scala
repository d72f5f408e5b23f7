package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** readStream over the columnfile format: new files become new
  * micro-batches; restarts resume from the committed frontier.
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
}
