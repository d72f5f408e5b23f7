package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-chunk Bloom filters in the stats sidecar (write option
  * `bloom=col,col`): point-lookup chunk pruning where min/max can't
  * help — a high-cardinality UNSORTED column whose every chunk spans
  * the whole value domain.
  */
class BloomPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("bloom-pruning-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  import ChunkStatsIndex._

  private def statsWithBloom(dt: DataType, values: Seq[Any]): ChunkStats = {
    val schema = StructType(Seq(StructField("c", dt)))
    val leaves = CellCodec.flatten(schema)
    val coll = new Collector(leaves, Set(0))
    values.foreach { v =>
      val cell =
        if (v == null) null
        else dt match {
          case StringType => CellCodec.encode(dt, UTF8String.fromString(v.asInstanceOf[String]))
          case _          => CellCodec.encode(dt, v)
        }
      coll.observe(Array(cell))
    }
    coll.finishChunk()
  }

  test("bloom prunes equality on absent values, never on present ones") {
    val leafIndex = Map("c" -> 0)
    val longType: Map[String, DataType] = Map("c" -> LongType)
    // values span the whole domain, so min/max alone can prune nothing
    val present = Seq(Long.MinValue, -7L, 0L, 12345L, Long.MaxValue)
    val st = statsWithBloom(LongType, present :+ null)
    assert(st.blooms.contains(0), "bloom missing from collected stats")
    def empty(f: Filter) = provesEmpty(f, st, leafIndex, longType)

    present.foreach(v =>
      assert(!empty(EqualTo("c", v)), s"present value $v wrongly pruned"))
    assert(empty(EqualTo("c", 54321L)))
    assert(empty(EqualNullSafe("c", 54321L)))
    assert(empty(In("c", Array(54321L, 99999L))))
    // one present element keeps the chunk
    assert(!empty(In("c", Array(54321L, 12345L))))
    // inequalities never consult the bloom
    assert(!empty(GreaterThan("c", 54321L)))

    val strType: Map[String, DataType] = Map("c" -> StringType)
    val strs = Seq("alpha", "kappa", "zeta")
    val st2 = statsWithBloom(StringType, strs)
    assert(!provesEmpty(EqualTo("c", "kappa"), st2, leafIndex, strType))
    // in [alpha, zeta] by range, absent by bloom
    assert(provesEmpty(EqualTo("c", "gamma"), st2, leafIndex, strType))
  }

  test("blooms survive the sidecar JSON round-trip") {
    val st = statsWithBloom(LongType, (0L until 1000L).map(i => i * 37L))
    val parsed = fromJson(toJson(Seq(st))).head
    val b0 = st.blooms(0)
    val b1 = parsed.blooms(0)
    assert(b1.k == b0.k)
    assert(b1.bits.toSeq == b0.bits.toSeq)
    // prune decisions identical through the round trip
    val leafIndex = Map("c" -> 0)
    val leafType: Map[String, DataType] = Map("c" -> LongType)
    for (v <- 0L until 3000L) {
      assert(
        provesEmpty(EqualTo("c", v), st, leafIndex, leafType) ==
          provesEmpty(EqualTo("c", v), parsed, leafIndex, leafType))
    }
  }

  test("no bloom is emitted when bits/key would be useless") {
    // MaxBloomHashes overflow path is impractical to hit in a unit test;
    // the bits/key floor is: > 262144 distinct values at the 1 Mi bit cap
    val many = (0L until 300000L).toSeq
    val st = statsWithBloom(LongType, many)
    assert(!st.blooms.contains(0),
      "bloom emitted past the bits/key floor — dead weight in the sidecar")
  }

  test("point lookup on an unsorted high-cardinality column prunes chunks") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-bloom").toString
    val dirNoBloom = Files.createTempDirectory("cf-nobloom").toString
    // deterministic shuffle: every chunk's [min,max] spans ~the whole
    // domain, so range stats can never prune a point lookup
    val rows = (0 until 20000).map(i => (f"k$i%05d", i.toLong))
      .sortBy { case (_, i) => ChunkStatsIndex.baseHashLong(i) }
    def write(out: String, bloomOpt: Option[String]): Unit = {
      val w = rows.toDF("k", "id").repartition(1)
        .write.format("columnfile").option("targetChunkBytes", "8192")
      bloomOpt.foreach(b => w.option("bloom", b))
      w.mode("overwrite").save(out)
    }
    write(dir, Some("k,id"))
    write(dirNoBloom, None)

    def parts(out: String, cond: org.apache.spark.sql.Column): Int =
      spark.read.format("columnfile").option("maxPartitionBytes", "1")
        .load(out).filter(cond).rdd.getNumPartitions

    val total = parts(dirNoBloom, col("id") >= 0)
    assert(total > 10, s"expected many chunks, got $total")
    // without blooms a point lookup scans nearly everything (min/max can
    // nick the odd chunk whose hashed-order range misses the key)
    assert(parts(dirNoBloom, col("k") === "k00123") > total * 8 / 10)
    // with blooms it touches ~1 chunk (false positives allowed, few)
    val strParts = parts(dir, col("k") === "k00123")
    val longParts = parts(dir, col("id") === 123L)
    assert(strParts < total / 5, s"string bloom ineffective: $strParts/$total")
    assert(longParts < total / 5, s"long bloom ineffective: $longParts/$total")
    // correctness: the surviving chunk still yields the row
    val hit = spark.read.format("columnfile").load(dir)
      .filter(col("k") === "k00123").collect()
    assert(hit.map(_.getLong(1)).toSeq == Seq(123L))
    // absent key: everything pruned, zero rows
    assert(spark.read.format("columnfile").load(dir)
      .filter(col("k") === "nope").count() == 0)
  }

  test("unknown bloom column fails fast at write") {
    val sp = spark; import sp.implicits._
    // surfaces directly from the write build on the driver, or wrapped
    // by Spark's job machinery — accept either
    val e = intercept[Throwable] {
      Seq((1L, "a")).toDF("id", "v").write.format("columnfile")
        .option("bloom", "missing_col")
        .mode("overwrite")
        .save(Files.createTempDirectory("cf-bloom-bad").toString)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[IllegalArgumentException]))
  }
}
