package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must agree exactly with the HOF-lambda SQL
  * formulation (which is what the DuckDB oracles run) — cross-checked
  * inside one Spark session over generated texts, including empties,
  * repeated spaces, and short strings.
  */
class TextHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("text-hash-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TextHashFunctions.register(spark.sessionState.functionRegistry)
    val words = Seq("the", "fast", "key", "order", "sort", "scan", "a", "zz")
    val rng = new scala.util.Random(7)
    val texts = (0 until 200).map { _ =>
      (0 until (3 + rng.nextInt(40))).map(_ => words(rng.nextInt(words.length)))
        .mkString(" ")
    } ++ Seq("", "a", "a b", "a  b  c", "x y z", "  ", "aaaaa")
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .createOrReplaceTempView("texts")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val P = 2147483647L
  private val polyHof =
    s"aggregate(transform(sequence(1, length(%s)), i -> CAST(ascii(substring(%s, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) %% $P)"

  private def assertAgree(nativeExpr: String, hofExpr: String,
                          where: String = "true"): Unit = {
    val n = spark.sql(
      s"SELECT count(*) FROM texts WHERE $where AND NOT ($nativeExpr) <=> ($hofExpr)")
      .head.getLong(0)
    assert(n == 0, s"$n rows disagree: $nativeExpr vs $hofExpr")
  }

  test("polyhash matches the lambda formulation") {
    assertAgree("graft_polyhash(text)", polyHof.format("text", "text"))
  }

  test("shingle hashes (distinct + all) match") {
    val sh = "transform(sequence(0, size(split(text, ' ')) - 3), i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i+1], ' ', split(text, ' ')[i+2]))"
    val hofAll = s"transform($sh, s -> ${polyHof.format("s", "s")})"
    assertAgree("graft_shingle_hashes_all(text)", hofAll,
      "size(split(text, ' ')) >= 3")
    assertAgree("graft_shingle_hashes(text)", s"array_distinct($hofAll)",
      "size(split(text, ' ')) >= 3")
  }

  test("gram hashes match") {
    val grams = "transform(sequence(1, length(text) - 4), i -> substring(text, i, 5))"
    assertAgree("graft_gram_hashes(text)",
      s"array_distinct(transform($grams, s -> ${polyHof.format("s", "s")}))",
      "length(text) >= 5")
  }

  test("minhash signature matches the 16 permutation mins") {
    val a = TextHashOps.A; val b = TextHashOps.B
    val mins = (0 until 16).map(k =>
      s"array_min(transform(graft_shingle_hashes(text), x -> (${a(k)} * x + ${b(k)}) % $P))")
      .mkString("array(", ", ", ")")
    assertAgree("graft_minhash_sig(graft_shingle_hashes(text))", mins,
      "size(split(text, ' ')) >= 3")
  }

  test("simhash matches the per-bit fold") {
    val bits = (0 until 31).map { j =>
      val pow = 1L << j
      s"(CASE WHEN aggregate(transform(graft_shingle_hashes_all(text), h -> CASE WHEN (h div $pow) % 2 = 1 THEN 1 ELSE -1 END), CAST(0 AS BIGINT), (a, b) -> a + b) >= 0 THEN ${pow}L ELSE 0L END)"
    }.mkString(" + ")
    assertAgree("graft_simhash31(graft_shingle_hashes_all(text))",
      s"CAST($bits AS BIGINT)", "size(split(text, ' ')) >= 3")
  }
}
