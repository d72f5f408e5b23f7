package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SaltedJoin.inner: result identity with the plain equi-join on a
  * skewed corpus (incl. duplicate rows and null keys), salt-spread of a
  * hot key across buckets, and the join-on-(key, salt) plan shape.
  */
class SaltedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("salted-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 90% of left rows carry the hot key; right has multiple rows per
    * key; duplicates and null keys included on both sides.
    */
  private def fixture = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val left = ((1 to 900).map(i => (Option("hot"), i % 50)) ++ // dup rows
      (1 to 100).map(i => (Option(s"k${rnd.nextInt(10)}"), i)) ++
      Seq((Option.empty[String], 1), (Option.empty[String], 2)))
      .toDF("key", "lv")
    val right = (Seq(("hot", 10), ("hot", 20)) ++
      (0 until 10).flatMap(i => Seq((s"k$i", i), (s"k$i", 100 + i))))
      .toDF("key", "rv")
      .union(Seq((null.asInstanceOf[String], 999)).toDF("key", "rv"))
    (left, right)
  }

  test("salted result is a multiset-identical inner join") {
    val (left, right) = fixture
    val got = SaltedJoin.inner(left, right, Seq("key"), salts = 8)
      .groupBy("key", "lv", "rv").count()
    val want = left.join(right, Seq("key"), "inner")
      .groupBy("key", "lv", "rv").count()
    assert(got.columns.sorted.sameElements(want.columns.sorted))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // null keys matched nothing
    assert(SaltedJoin.inner(left, right, Seq("key"), 8)
      .where(col("key").isNull).count() == 0)
  }

  test("the hot key spreads across multiple salt buckets") {
    val (left, _) = fixture
    val spread = left.where(col("key") === "hot")
      .withColumn("__salt",
        pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(spread >= 4, s"hot key landed in only $spread of 8 salt buckets")
  }

  test("byte-identical duplicate rows spread too (partition-id mix-in)") {
    val sp = spark; import sp.implicits._
    // the degenerate flood: many copies of ONE row — a row-content hash
    // alone would give them all the same salt and re-create the single
    // straggler; the partition-id mix-in spreads them
    val dups = Seq.fill(4000)(("hot", 0)).toDF("key", "lv").repartition(8)
    val right = Seq(("hot", 1)).toDF("key", "rv")
    val spread = SaltedJoin.inner(dups, right, Seq("key"), salts = 8)
      .count()
    assert(spread == 4000L) // semantics unchanged
    val saltCount = dups.withColumn("__salt",
        pmod(xxhash64(dups.columns.map(col).toSeq :+ spark_partition_id(): _*),
          lit(8)))
      .select("__salt").distinct().count()
    assert(saltCount >= 4,
      s"identical dup rows landed in only $saltCount of 8 salt buckets")
  }

  test("reserved working-column names are rejected") {
    val (left, right) = fixture
    intercept[IllegalArgumentException] {
      SaltedJoin.inner(left.withColumnRenamed("lv", "__salt"), right,
        Seq("key"), 8)
    }
  }

  test("chooseSalts: planted hot key picks >1, uniform keys pick 1") {
    val sp = spark; import sp.implicits._
    // hot: one key carries ~90% of rows — must split
    val (left, _) = fixture
    val hot = SaltedJoin.chooseSalts(left, Seq("key"),
      maxSalts = 32, sampleFraction = 1.0)
    assert(hot > 1, s"planted hot key picked $hot salts")
    // uniform: every key appears exactly 4 times across 1000 keys
    val uniform = (0 until 1000).flatMap(k => Seq.fill(4)((s"k$k", k)))
      .toDF("key", "lv")
    val u = SaltedJoin.chooseSalts(uniform, Seq("key"),
      maxSalts = 32, sampleFraction = 1.0)
    assert(u == 1, s"uniform keys picked $u salts")
    // empty input sizes to 1 (no crash on the null max)
    assert(SaltedJoin.chooseSalts(uniform.limit(0), Seq("key"),
      32, 1.0) == 1)
    // auto join result identical to the plain join on the hot corpus
    val (l2, r2) = fixture
    val got = SaltedJoin.innerAuto(l2, r2, Seq("key"), maxSalts = 8,
      sampleFraction = 1.0).groupBy("key", "lv", "rv").count()
    val want = l2.join(r2, Seq("key"), "inner")
      .groupBy("key", "lv", "rv").count()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("plan joins on (key, salt) with no nested loop") {
    val (left, right) = fixture
    val plan = SaltedJoin.inner(left, right, Seq("key"), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__salt"), plan)
  }
}
