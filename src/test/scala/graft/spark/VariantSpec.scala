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
}
