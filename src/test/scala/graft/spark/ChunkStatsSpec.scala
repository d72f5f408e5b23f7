package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ChunkStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("chunk-stats-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  import ChunkStatsIndex._

  test("stats JSON round-trip") {
    val chunks = Seq(
      ChunkStats(100, Map(
        0 -> (Some(LongRange(-5, 99)), 3L),
        1 -> (Some(StringRange("a\"b", "z\nx")), 0L),
        2 -> (Some(DoubleRange(0.25, 1e9)), 10L),
        3 -> (None, 100L))),
      ChunkStats(1, Map.empty))
    assert(fromJson(toJson(chunks)) == chunks)
    // object form with file length + chunk offsets
    val withLoc = chunks.zipWithIndex.map { case (c, i) =>
      c.copy(off = 4L + i * 1000L, bytes = 997L)
    }
    assert(fromJsonWithLen(toJson(123456L, withLoc)) == ((123456L, withLoc)))
  }

  test("property: random stats round-trip the JSON exactly (both forms)") {
    val rnd = new scala.util.Random(42)
    def randRange(): Option[Range] = rnd.nextInt(4) match {
      case 0 => Some(LongRange(rnd.nextLong(), rnd.nextLong()))
      case 1 => Some(DoubleRange(rnd.nextDouble() * 1e6 - 5e5, rnd.nextDouble() * 1e6))
      case 2 => Some(StringRange(
        rnd.alphanumeric.take(rnd.nextInt(8)).mkString + "\"\\\n\t",
        rnd.alphanumeric.take(rnd.nextInt(8)).mkString + "" +
          new String(Character.toChars(0x10000))))
      case _ => None
    }
    for (_ <- 0 until 200) {
      val chunks = Seq.fill(rnd.nextInt(4))(ChunkStats(
        rnd.nextInt(1000).toLong,
        (0 until rnd.nextInt(5)).map(i => i -> (randRange(), rnd.nextInt(100).toLong)).toMap,
        off = if (rnd.nextBoolean()) rnd.nextInt(1 << 20).toLong else -1L,
        bytes = rnd.nextInt(1 << 20).toLong))
      // legacy array form drops offsets at parse only when absent; the
      // object form preserves everything
      val normalized = chunks.map(c => if (c.off < 0) c.copy(bytes = -1L) else c)
      assert(fromJsonWithLen(toJson(rnd.nextInt(1 << 24).toLong, normalized))._2
        == normalized)
    }
  }

  test("provesEmpty: range, null, and In pruning") {
    val leafIndex = Map("id" -> 0, "name" -> 1)
    val leafType: Map[String, DataType] = Map("id" -> LongType, "name" -> StringType)
    val s = ChunkStats(50, Map(
      0 -> (Some(LongRange(100, 200)), 0L),
      1 -> (Some(StringRange("alpha", "beta")), 0L)))
    def empty(f: Filter) = provesEmpty(f, s, leafIndex, leafType)

    assert(empty(EqualTo("id", 99L)))
    assert(!empty(EqualTo("id", 150L)))
    assert(empty(GreaterThan("id", 200L)))
    assert(!empty(GreaterThan("id", 199L)))
    assert(empty(GreaterThanOrEqual("id", 201L)))
    assert(empty(LessThan("id", 100L)))
    assert(!empty(LessThanOrEqual("id", 100L)))
    assert(empty(In("id", Array(1L, 2L, 300L))))
    assert(!empty(In("id", Array(1L, 150L))))
    assert(empty(IsNull("id")))
    assert(!empty(IsNotNull("id")))
    assert(empty(And(EqualTo("id", 150L), EqualTo("name", "zzz"))))
    assert(empty(Or(EqualTo("id", 99L), EqualTo("name", "zzz"))))
    assert(!empty(Or(EqualTo("id", 99L), EqualTo("name", "beta"))))
    assert(empty(StringStartsWith("name", "c")))
    assert(!empty(StringStartsWith("name", "be")))

    val allNull = ChunkStats(50, Map(0 -> (None, 50L)))
    assert(provesEmpty(IsNotNull("id"), allNull, leafIndex, leafType))
    assert(provesEmpty(EqualTo("id", 1L), allNull, leafIndex, leafType))
  }

  test("StringStartsWith pruning: min extending the prefix is NOT pruned") {
    val leafIndex = Map("name" -> 0)
    val leafType: Map[String, DataType] = Map("name" -> StringType)
    def s(lo: String, hi: String) =
      ChunkStats(10, Map(0 -> (Some(StringRange(lo, hi)), 0L)))
    def empty(p: String, lo: String, hi: String) =
      provesEmpty(StringStartsWith("name", p), s(lo, hi), leafIndex, leafType)

    // the round-2 wrong-results case: lo > p but lo still starts with p
    assert(!empty("appl", "applz", "applz"))
    assert(!empty("a", "alpha", "beta"))
    // lo beyond the prefix range without extending it: prune
    assert(empty("appl", "appm", "apzz"))
    // hi below the prefix: prune (hi < p alone is sound)
    assert(empty("c", "alpha", "beta"))
    assert(empty("appl", "aa", "ap"))
    // straddling range: keep
    assert(!empty("appl", "aaa", "zzz"))
  }

  test("float stats: NaN chunk carries no range; -0.0 normalized to 0.0") {
    val schema = StructType(Seq(StructField("d", DoubleType)))
    val leaves = CellCodec.flatten(schema)
    val leafIndex = Map("d" -> 0)
    val leafType: Map[String, DataType] = Map("d" -> DoubleType)

    val coll = new Collector(leaves)
    Seq(1.0, 2.0, Double.NaN).foreach(v =>
      coll.observe(Array(CellCodec.encode(DoubleType, v))))
    val st = coll.finishChunk()
    // no range => never pruned (NaN sorts greatest, so x > 5 matches it)
    assert(st.cols(0)._1.isEmpty)
    assert(!provesEmpty(GreaterThan("d", java.lang.Double.valueOf(5.0)),
      st, leafIndex, leafType))

    val c2 = new Collector(leaves)
    c2.observe(Array(CellCodec.encode(DoubleType, -0.0)))
    val st2 = c2.finishChunk()
    // -0.0 == 0.0 in the engine: a [-0.0] chunk must survive `= 0.0`
    assert(!provesEmpty(EqualTo("d", java.lang.Double.valueOf(0.0)),
      st2, leafIndex, leafType))
    assert(!provesEmpty(EqualTo("d", java.lang.Double.valueOf(-0.0)),
      st2, leafIndex, leafType))
  }

  test("string stats use UTF-8 code-point order, not UTF-16") {
    val schema = StructType(Seq(StructField("s", StringType)))
    val leaves = CellCodec.flatten(schema)
    val supp = new String(Character.toChars(0x10000)) // U+10000
    val pua = "\uE000"
    // Java UTF-16 order disagrees with Spark's UTF-8 order on this pair
    assert(supp.compareTo(pua) < 0)
    assert(ChunkStatsIndex.utf8Cmp(supp, pua) > 0)
    val coll = new Collector(leaves)
    Seq(supp, pua).foreach(v => coll.observe(Array(
      CellCodec.encode(StringType, org.apache.spark.unsafe.types.UTF8String.fromString(v)))))
    val st = coll.finishChunk()
    assert(st.cols(0)._1.contains(StringRange(pua, supp)))
  }

  test("decimal stats: unscaled-long ranges prune exactly; wide decimals carry no stats") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-dec-stats").toString
    sp.sql("""SELECT id, CAST(CAST(id AS DOUBLE) / 4 AS DECIMAL(18,2)) AS d
             |FROM range(20000)""".stripMargin)
      .repartition(1).sortWithinPartitions("id")
      .write.format("columnfile").option("targetChunkBytes", "8192")
      .mode("overwrite").save(dir)
    def scan(cond: org.apache.spark.sql.Column) =
      spark.read.format("columnfile").option("maxPartitionBytes", "1").load(dir)
        .filter(cond)
    val all = scan(col("d") >= 0).rdd.getNumPartitions
    val few = scan(col("d") > new java.math.BigDecimal("4970.00")).rdd.getNumPartitions
    assert(all > 10 && few < all / 5, s"decimal pruning ineffective: $few of $all")
    // correctness at the boundary
    assert(scan(col("d") > new java.math.BigDecimal("4970.00")).count() == 119)
    assert(scan(col("d") === new java.math.BigDecimal("4999.75")).count() == 1)
    // decimal MIN/MAX from stats only
    val t = spark.read.format("columnfile").load(dir)
    val agg = t.agg(min("d"), max("d"))
    assert(agg.queryExecution.executedPlan.toString.contains("stats-only"))
    assert(agg.head.getDecimal(0) == new java.math.BigDecimal("0.00"))
    assert(agg.head.getDecimal(1) == new java.math.BigDecimal("4999.75"))
  }

  test("prefix filter end-to-end: chunks with mins extending the prefix survive") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-prefix").toString
    // sorted so every chunk's min is an extension of "appl" — the round-2
    // bug pruned every chunk and returned zero rows
    (0 until 2000).map(i => f"applz$i%04d").toDF("s")
      .repartition(1).sortWithinPartitions("s")
      .write.format("columnfile").option("targetChunkBytes", "2048")
      .mode("overwrite").save(dir)
    val f = new java.io.File(dir)
    assert(f.listFiles().exists(_.getName.endsWith(ChunkStatsIndex.Suffix)))
    val t = spark.read.format("columnfile").load(dir)
    assert(t.filter(col("s").startsWith("appl")).count() == 2000)
    assert(t.filter(col("s").startsWith("applz00")).count() == 100)
    assert(t.filter(col("s").startsWith("xyz")).count() == 0)
  }

  test("planning runs from the sidecar alone: no data-file opens on the driver") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-sidecar-plan").toString
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).sortWithinPartitions("id")
      .write.format("columnfile").option("targetChunkBytes", "8192")
      .mode("overwrite").save(dir)

    // sidecar records chunk offsets and the file length
    val dataFile = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(ColumnFileDataSource.FileExtension)).head
    val ss = ChunkStatsIndex.readWithLen(new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(dataFile.getAbsolutePath)).get
    assert(ss._1 == dataFile.length())
    assert(ss._2.nonEmpty && ss._2.forall(c => c.off >= 0 && c.bytes > 0))
    assert(ss._2.head.off == 4) // first chunk right after the magic

    // overwrite the data file with garbage of the SAME length: any
    // driver-side header walk would now throw, so successful partition
    // planning (and stats estimation) proves the sidecar was the only
    // metadata source
    java.nio.file.Files.write(dataFile.toPath,
      Array.fill[Byte](dataFile.length().toInt)(0x5a))
    def planned(cond: org.apache.spark.sql.Column): Int =
      spark.read.format("columnfile").option("maxPartitionBytes", "1").load(dir)
        .filter(cond).rdd.getNumPartitions
    val all = planned(col("id") >= 0)
    val few = planned(col("id") >= 19900)
    assert(all > 10, s"expected many chunk partitions, got $all")
    assert(few < all / 5, s"sidecar pruning ineffective: $few of $all")

    // stale sidecar (length mismatch after append/rewrite) falls back to
    // the header walk — which on this garbage file must throw, not
    // silently mis-plan
    java.nio.file.Files.write(dataFile.toPath,
      Array.fill[Byte](dataFile.length().toInt + 1)(0x5a))
    intercept[Exception] { planned(col("id") >= 0) }
  }

  test("driver-side chunk pruning: selective filter plans fewer partitions") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-stats").toString
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(1).sortWithinPartitions("id")
      .write.format("columnfile").option("targetChunkBytes", "8192")
      .mode("overwrite").save(dir)
    // stats sidecar exists
    val f = new java.io.File(dir)
    assert(f.listFiles().exists(_.getName.endsWith(ChunkStatsIndex.Suffix)))

    // one partition per chunk so the partition count shows pruning
    def scan(cond: org.apache.spark.sql.Column) =
      spark.read.format("columnfile").option("maxPartitionBytes", "1").load(dir)
        .filter(cond)

    val all = scan(col("id") >= 0)
    val few = scan(col("id") >= 19900)
    val allParts = all.rdd.getNumPartitions
    val fewParts = few.rdd.getNumPartitions
    assert(allParts > 10, s"expected many chunks, got $allParts")
    assert(fewParts < allParts / 5,
      s"pruning ineffective: $fewParts of $allParts partitions remain")
    // correctness unaffected
    assert(few.collect().map(_.getLong(0)).sorted.toSeq ==
      (19900L until 20000L))
    assert(scan(col("v") === "v12345").count() == 1)
  }
}
