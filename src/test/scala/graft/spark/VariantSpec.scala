package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** VariantType as a storable leaf: the open-schema column the
  * reference's capnp shredder explicitly TODOs (unions,
  * columnfile-capnp.cc:96,205). Cells store the VariantVal's two binary
  * parts varint-framed; round-trips must preserve them bit-exactly so
  * `variant_get` extraction after a cf round-trip matches extraction
  * from the original.
  */
class VariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("variant-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // crisp plan trees
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("variant columns round-trip through the cf format bit-exactly") {
    val dir = Files.createTempDirectory("cf-variant").toString
    val src = spark.sql(
      """SELECT id,
        |  parse_json(CASE
        |    WHEN id % 4 = 0 THEN concat('{"kind":"num","v":', id, '}')
        |    WHEN id % 4 = 1 THEN concat('{"kind":"str","v":"s', id, '","tags":["a","b"]}')
        |    WHEN id % 4 = 2 THEN concat('{"kind":"nested","v":{"x":', id, ',"y":[1,2,3]}}')
        |    ELSE 'null'
        |  END) AS v
        |FROM range(200)""".stripMargin)
    src.write.format("columnfile").mode("overwrite").save(dir)
    val back = spark.read.format("columnfile").load(dir)
    assert(back.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType)
    assert(back.count() == 200)
    // bit-exact: to_json of the variant matches the original's
    val a = src.selectExpr("id", "to_json(v) AS j")
    val b = back.selectExpr("id", "to_json(v) AS j")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // typed extraction works on the round-tripped column
    val nums = back.where("variant_get(v, '$.kind', 'string') = 'num'")
      .selectExpr("CAST(variant_get(v, '$.v', 'long') AS LONG) AS n")
      .agg(sum("n")).head.getLong(0)
    assert(nums == (0L until 200L by 4).sum)
    // nested path extraction
    val ys = back.where("variant_get(v, '$.kind', 'string') = 'nested'")
      .selectExpr("variant_get(v, '$.v.y[2]', 'int') AS y2")
      .collect()
    assert(ys.nonEmpty && ys.forall(_.getInt(0) == 3))
  }

  test("variant inside nested structures (array of variant, struct field)") {
    val dir = Files.createTempDirectory("cf-variant-nested").toString
    val src = spark.sql(
      """SELECT id,
        |  array(parse_json(concat('{"i":', id, '}')), NULL) AS arr,
        |  named_struct('tag', concat('t', id),
        |               'payload', parse_json(concat('[', id, ',', id + 1, ']'))) AS st
        |FROM range(50)""".stripMargin)
    src.write.format("columnfile").mode("overwrite").save(dir)
    val back = spark.read.format("columnfile").load(dir)
    val a = src.selectExpr("id", "to_json(arr[0]) AS a0", "arr[1] IS NULL AS a1n",
      "st.tag AS tag", "to_json(st.payload) AS pj")
    val b = back.selectExpr("id", "to_json(arr[0]) AS a0", "arr[1] IS NULL AS a1n",
      "st.tag AS tag", "to_json(st.payload) AS pj")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("shredded-path variant_get filters push into the scan, prune " +
    "chunks, and drop the variant payload from the read") {
    import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = Files.createTempDirectory("cf-variant-shred").toString
    // 10k docs, price == id, sorted by the shredded leaf; tiny chunks
    // so range probes have something to prune
    spark.sql(
      """SELECT id, parse_json(concat('{"price":', id, ',"s":"x', id,
        |  '"}')) AS v FROM range(10000)""".stripMargin)
      .select(col("id"), col("v"),
        expr("variant_get(v, '$.price', 'bigint')")
          .as("v_price", VariantShred.shredMeta("v", "$.price")))
      .orderBy("v_price")
      .write.format("columnfile").option("targetChunkBytes", "4096")
      .mode("overwrite").save(dir)
    spark.read.format("columnfile").load(dir)
      .createOrReplaceTempView("vshred")
    val q = spark.sql(
      """SELECT CAST(SUM(variant_get(v, '$.price', 'bigint')) AS BIGINT)
        |    AS s, COUNT(*) AS n
        |FROM vshred
        |WHERE variant_get(v, '$.price', 'bigint')
        |  BETWEEN 100 AND 199""".stripMargin)
    val row = q.head()
    assert(row.getLong(0) == (100L to 199L).sum && row.getLong(1) == 100L)
    val exec = q.queryExecution.executedPlan
    // the rewrite fired: no VariantGet survives anywhere in the plan
    val vgs = exec.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case g: VariantGet => g })
    assert(vgs.isEmpty, s"live VariantGet in the plan:\n$exec")
    val scan = exec.collect { case b: BatchScanExec => b }.head
    // the variant payload is pruned from the read schema entirely
    assert(!scan.output.map(_.name).contains("v"),
      s"variant column still read: ${scan.output}")
    // the range filter reached the scan as a plain pushed filter
    assert(scan.toString.contains("v_price"),
      s"shred filter not pushed:\n$scan")
    // chunk pruning: the selective probe plans fewer partitions than
    // the full scan of the same leaf
    val fullScan = spark.sql("SELECT v_price FROM vshred")
      .queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    assert(scan.inputRDD.partitions.length <
      fullScan.inputRDD.partitions.length,
      s"no chunk pruning: ${scan.inputRDD.partitions.length} vs " +
        s"${fullScan.inputRDD.partitions.length}")
    // pruning soundness on the shredded leaf: random ranges return
    // exactly the arithmetic truth (pruning never drops a match)
    val rnd = new scala.util.Random(20260815L)
    (1 to 20).foreach { _ =>
      val lo = rnd.nextInt(11000) - 500
      val hi = lo + rnd.nextInt(2000)
      val got = spark.sql(
        s"""SELECT COUNT(*) AS n FROM vshred
           |WHERE variant_get(v, '$$.price', 'bigint')
           |  BETWEEN $lo AND $hi""".stripMargin).head().getLong(0)
      val expect = math.max(0, math.min(hi, 9999) - math.max(lo, 0) + 1)
      assert(got == expect, s"range [$lo,$hi]: $got vs $expect")
    }
  }
}
