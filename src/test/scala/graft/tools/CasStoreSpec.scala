package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Content-addressed store semantics: idempotent put (one object per
  * content, racer-safe commit), urn round-trip through a real
  * columnfile read, and loud failure on absence/corruption — the
  * equivalent of the reference tools' CAS-table I/O
  * (columnfile-cat.cc:22-24,47), re-expressed on the Hadoop FS.
  */
class CasStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: java.io.File = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("cas-store-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dir = Files.createTempDirectory("cas_spec").toFile
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (dir != null) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  private def conf = spark.sparkContext.hadoopConfiguration

  test("put is idempotent and content-addressed; cf reads back via urn") {
    val sp = spark; import sp.implicits._
    val table = new java.io.File(dir, "t").getAbsolutePath
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .repartition(1)
      .write.format("columnfile").mode("overwrite").save(table)
    val dataFile = new java.io.File(table).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".cf"))
      .head.getAbsolutePath

    val store = new java.io.File(dir, "store").getAbsolutePath
    val urn1 = CasStore.put(conf, store, dataFile)
    val urn2 = CasStore.put(conf, store, dataFile)
    assert(urn1 == urn2, "same content must map to one urn")
    // exactly one stored object (the local FS adds .crc sidecars)
    val objects = new java.io.File(store).listFiles().flatMap(_.listFiles())
      .filterNot(_.getName.startsWith("."))
    assert(objects.length == 1)

    // a DIFFERENT content gets a different urn and its own object
    val other = new java.io.File(dir, "other.bin")
    Files.write(other.toPath, Array[Byte](1, 2, 3))
    val urn3 = CasStore.put(conf, store, other.getAbsolutePath)
    assert(urn3 != urn1)

    // resolve: byte-identical object (the CAS contract), and still a
    // readable columnfile — a lone data file reads untyped (binary
    // cells, the reference's byte-string cell model), all rows present
    val resolved = CasStore.resolve(conf, store, urn1)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(new java.io.File(dataFile).toPath),
      Files.readAllBytes(new java.io.File(resolved).toPath)))
    assert(spark.read.format("columnfile").load(resolved).count() == 3)
    assert(CasStore.verify(conf, store, urn1))
  }

  test("absence and corruption fail loudly") {
    val store = new java.io.File(dir, "store2").getAbsolutePath
    val missing = "urn:graft:ca:sha256:" + "0" * 64
    intercept[java.io.FileNotFoundException] {
      CasStore.resolve(conf, store, missing)
    }
    intercept[IllegalArgumentException] {
      CasStore.resolve(conf, store, "urn:other:thing")
    }
    // corrupt a stored object in place (bypassing the local FS's own
    // .crc layer, which then ALSO rejects the read — either path must
    // come back as "verification failed", never as "good")
    val f = new java.io.File(dir, "payload.bin")
    Files.write(f.toPath, "hello cas".getBytes)
    val urn = CasStore.put(conf, store, f.getAbsolutePath)
    val obj = new java.io.File(CasStore.resolve(conf, store, urn))
    val bytes = Files.readAllBytes(obj.toPath)
    bytes(0) = (bytes(0) ^ 0x7f).toByte
    Files.write(obj.toPath, bytes)
    assert(!CasStore.verify(conf, store, urn))
  }
}
