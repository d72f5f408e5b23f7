package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin.asOf semantics: inclusive vs strict time bounds, left-outer
  * nulls, atomic multi-column payload carry, equal-time tiebreak, and
  * the one-shuffle/no-blowup plan shape.
  */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("asof-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fixture = {
    val sp = spark; import sp.implicits._
    val quotes = Seq(
      ("A", 1L, 10.0, "mm1"),
      ("A", 7L, 11.0, "mm2"),
      ("A", 10L, 12.0, "mm3"),
      ("B", 4L, 99.0, "mm4")
    ).toDF("sym", "qts", "px", "src")
    val trades = Seq(
      ("A", 5L, 100),  // between quotes @1 and @7 -> @1
      ("A", 10L, 200), // exactly at quote @10 -> inclusive @10, strict @7
      ("B", 3L, 300),  // before B's only quote -> no match
      ("C", 8L, 400)   // key with no right rows at all -> no match
    ).toDF("sym", "tts", "qty")
    (trades, quotes)
  }

  test("inclusive: latest right row at or before each left time; outer nulls") {
    val (trades, quotes) = fixture
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts")
      .orderBy("sym", "tts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), Option(r.getString(4))))
      .toSeq
    assert(got == Seq(
      ("A", 5L, 100, Some(10.0), Some("mm1")),
      ("A", 10L, 200, Some(12.0), Some("mm3")),
      ("B", 3L, 300, None, None),
      ("C", 8L, 400, None, None)))
  }

  test("strict: equal-time right rows are excluded") {
    val (trades, quotes) = fixture
    val got = AsOfJoin
      .asOf(trades, quotes, Seq("sym"), "tts", "qts", strict = true)
      .where(col("sym") === "A" && col("tts") === 10L)
      .collect()
    assert(got.length == 1)
    assert(got(0).getDouble(3) == 11.0 && got(0).getString(4) == "mm2")
  }

  test("equal-time right duplicates: one canonical (struct-greatest) winner, payload atomic") {
    val sp = spark; import sp.implicits._
    // two quotes at the same instant: the greater (px, src) struct must
    // win, and BOTH payload columns must come from that same row (a
    // per-column max would mix 9.0 with "z")
    val quotes = Seq(("A", 5L, 9.0, "z"), ("A", 5L, 20.0, "a"))
      .toDF("sym", "qts", "px", "src")
    val trades = Seq(("A", 6L, 1)).toDF("sym", "tts", "qty")
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts").collect()
    assert(got.length == 1)
    assert(got(0).getDouble(3) == 20.0 && got(0).getString(4) == "a")
  }

  test("null right timestamps are never matches; null left times carry nothing") {
    val sp = spark; import sp.implicits._
    val quotes = Seq(
      ("A", Option.empty[java.lang.Long], 66.0, "ghost"), // null ts: no match ever
      ("A", Option(3L).map(java.lang.Long.valueOf), 10.0, "mm1")
    ).toDF("sym", "qts", "px", "src")
    val trades = Seq(
      ("A", Option(5L).map(java.lang.Long.valueOf), 100),
      ("A", Option.empty[java.lang.Long], 200) // null left ts: matches nothing
    ).toDF("sym", "tts", "qty")
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tts", "qts")
      .collect()
      .map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), Option(r.getString(4))))
      .toSet
    assert(got == Set(
      (Some(5L), 100, Some(10.0), Some("mm1")), // ghost never carried
      (None, 200, None, None)))
  }

  test("empty key list and reserved column names are rejected") {
    val (trades, quotes) = fixture
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes, Seq.empty, "tts", "qts")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades.withColumnRenamed("qty", "__pay"), quotes,
        Seq("sym"), "tts", "qts")
    }
  }

  test("payload name clash and empty payload are rejected") {
    val (trades, quotes) = fixture
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes.withColumnRenamed("px", "qty"),
        Seq("sym"), "tts", "qts")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes.select("sym", "qts"),
        Seq("sym"), "tts", "qts")
    }
  }

  test("plan: one shuffle on the key, no join node, survives 200k x 200k") {
    val sp = spark; import sp.implicits._
    val n = 200000
    // 20 hot keys on both sides — an inequality join would build ~10k
    // candidates per left row (2x10^9 total); the carry-forward shape
    // is one sort per key
    val left = (0 until n).map(i => (i % 20, i.toLong, i)).toDF("k", "lt", "v")
    val right = (0 until n).map(i => (i % 20, i.toLong, i * 2L)).toDF("k", "rt", "p")
    val joined = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join node:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      s"too many shuffles:\n$plan")
    // correctness at the edge: left at time t matches right at time t
    // (same i), so payload == 2*lt everywhere
    assert(joined.where(col("p") =!= col("lt") * 2).count() == 0)
    assert(joined.count() == n.toLong)
  }
}
