package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** graft_dot must be BIT-IDENTICAL to the HOF formulation the DuckDB
  * oracles keep (aggregate(zip_with(...))): same widening, same
  * left-to-right IEEE addition order, same NULL contract.
  */
class VectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("vector-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorFunctions.register(spark.sessionState.functionRegistry)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("bit-identical to the HOF fold on random float arrays (nulls, mismatches, empties)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(0x5EED)
    val rows = (0 until 2000).map { i =>
      def vec(n: Int): Seq[java.lang.Float] = Seq.tabulate(n) { _ =>
        if (rnd.nextInt(50) == 0) null
        else java.lang.Float.valueOf(
          (rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3)).toFloat)
      }
      val n = rnd.nextInt(10) * 8
      val m = if (rnd.nextInt(10) == 0) n + 1 + rnd.nextInt(3) else n
      (vec(n), vec(m))
    }
    val df = rows.toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val out = spark.sql(
      s"SELECT graft_dot(a, b) AS fast, $hof AS slow FROM vecs").collect()
    out.zipWithIndex.foreach { case (r, i) =>
      val (fast, slow) = (r.get(0), r.get(1))
      assert(fast == slow ||
        (fast != null && slow != null &&
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1))),
        s"row $i: fast=$fast slow=$slow")
    }
  }

  test("double arrays and mixed float/double operands") {
    val out = spark.sql(
      """SELECT
        |  graft_dot(array(CAST(1.5 AS DOUBLE), CAST(-2.25 AS DOUBLE)),
        |            array(CAST(4.0 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS dd,
        |  graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS fd,
        |  graft_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty
        |""".stripMargin).head
    assert(out.getDouble(0) == 1.5 * 4.0 + (-2.25) * 0.5)
    assert(out.getDouble(1) == 1.5 * 2.0 + 2.0 * 3.0)
    assert(out.getDouble(2) == 0.0)
  }
}
