package graft.spark

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.GreaterThanOrEqual
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ScanMetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("scan-metrics-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("readers report chunks read/skipped and decoded bytes") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-metrics").toString
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).sortWithinPartitions("id")
      .write.format("columnfile").option("targetChunkBytes", "8192")
      .mode("overwrite").save(dir)

    val conf = new Configuration(false)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".cf")).head
    val in = new HadoopSeekableInput(
      new org.apache.hadoop.fs.Path(f.getPath)
        .getFileSystem(conf), new org.apache.hadoop.fs.Path(f.getPath), f.length())
    val chunks = try graft.format.ColumnFileReader.scanChunks(in) finally in.close()
    assert(chunks.length > 5)

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val part = ColumnFilePartition(
      f.getPath, f.length(), chunks.map(_.headerOffset).toArray)

    // Selective filter over sorted data: most chunks must be SKIPPED by
    // the reader's pass-1 evaluation (no stats pruning here — we built
    // the partition by hand).
    val reader = new ColumnFileColumnarPartitionReader(
      part, schema, schema, Array(GreaterThanOrEqual("id", 19900L)), conf)
    var rows = 0
    while (reader.next()) rows += reader.get().numRows()
    reader.close()
    assert(rows == 100)
    val m = reader.metrics
    assert(m.chunksSkipped > 0, "expected skipped chunks")
    assert(m.chunksRead >= 1 && m.chunksRead + m.chunksSkipped == chunks.length)
    assert(m.decodedBytes > 0)
    val names = reader.currentMetricsValues().map(_.name()).toSet
    assert(names == Set(ScanMetrics.ChunksRead, ScanMetrics.ChunksSkipped,
      ScanMetrics.DecodedBytes, ScanMetrics.CorruptChunks))
    assert(m.corruptChunks == 0)
  }
}
