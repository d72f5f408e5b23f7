package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin semantics vs a naive cross-join-and-filter ground truth
  * (randomized corpora incl. negative values and nulls), boundary
  * inclusivity, exactly-once pair emission for overlaps, keyless mode,
  * the per-row span guard, and the no-nested-loop plan shape.
  */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("range-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Deterministic pseudo-random corpora: points (pid, key, t) and
    * intervals (iid, key, s, e) spanning negatives, zero-width, and
    * multi-bin widths; some null times/bounds.
    */
  private def corpora = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    val points = (1 to 300).map { i =>
      val t: java.lang.Long =
        if (rnd.nextInt(20) == 0) null else (rnd.nextInt(2000) - 1000).toLong
      (i.toLong, s"k${rnd.nextInt(5)}", t)
    }.toDF("pid", "key", "t")
    val intervals = (1 to 120).map { i =>
      val s = (rnd.nextInt(2000) - 1000).toLong
      val len = rnd.nextInt(4) match {
        case 0 => 0L                       // zero-width
        case 1 => rnd.nextInt(10).toLong   // sub-bin
        case _ => rnd.nextInt(400).toLong  // spans many bins at w=50
      }
      val sBox: java.lang.Long = if (rnd.nextInt(25) == 0) null else s
      (i.toLong, s"k${rnd.nextInt(5)}", sBox, (s + len): java.lang.Long)
    }.toDF("iid", "key", "s", "e")
    (points, intervals)
  }

  private def pairs(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pointInInterval matches naive cross-join ground truth (keyed)") {
    val (points, intervals) = corpora
    val got = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "t", "s", "e", binWidth = 50L)
    val want = points.as("l").join(intervals.as("r"),
      col("l.key") === col("r.key") &&
        col("l.t") >= col("r.s") && col("l.t") <= col("r.e"))
    assert(pairs(got, "pid", "iid") == pairs(want, "pid", "iid"))
    assert(got.columns.toSeq == Seq("pid", "key", "t", "iid", "s", "e"))
  }

  test("pointInInterval keyless (pure range join) matches ground truth") {
    val (points, intervals) = corpora
    val got = RangeJoin.pointInInterval(points, intervals.drop("key"),
      Seq.empty, "t", "s", "e", binWidth = 50L)
    val want = points.crossJoin(intervals.drop("key"))
      .where(col("t") >= col("s") && col("t") <= col("e"))
    assert(pairs(got, "pid", "iid") == pairs(want, "pid", "iid"))
  }

  test("overlap matches ground truth and emits each pair exactly once") {
    val (_, intervals) = corpora
    val left = intervals.toDF("lid", "key", "ls", "le")
    val right = intervals.toDF("rid", "key", "rs", "re")
      .withColumnRenamed("key", "key") // same key column name for `on`
    val got = RangeJoin.overlap(left, right, Seq("key"),
      "ls", "le", "rs", "re", binWidth = 50L)
    val want = left.as("l").join(right.as("r"),
      col("l.key") === col("r.key") &&
        col("ls") <= col("re") && col("rs") <= col("le"))
    // multiset check: no duplicate emission from shared bins
    val gotRows = got.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotRows.distinct.size == gotRows.size,
      "overlap emitted a pair more than once")
    assert(gotRows.toSet == pairs(want, "lid", "rid"))
  }

  test("closed-interval boundaries are inclusive on both ends") {
    val sp = spark; import sp.implicits._
    val p = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L))
      .toDF("pid", "t")
    val iv = Seq((7L, 10L, 20L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, Seq.empty, "t", "s", "e", 7L)
    assert(pairs(got, "pid", "iid") == Set((1L, 7L), (2L, 7L)))
  }

  test("span guard fails loudly on an interval exploding past maxBins") {
    val sp = spark; import sp.implicits._
    val p = Seq((1L, 5L)).toDF("pid", "t")
    val iv = Seq((1L, 0L, 10_000_000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(p, iv, Seq.empty, "t", "s", "e",
        binWidth = 10L, maxBinsPerInterval = 1000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("rangeJoin")), s"got: $ex")
  }

  test("inverted intervals are empty: no match, no descending-sequence explosion") {
    val sp = spark; import sp.implicits._
    val p = Seq((1L, 5L)).toDF("pid", "t")
    // end < start by a huge span: a descending sequence(s, e) would
    // materialize millions of bins and bypass the span guard entirely
    val iv = Seq((1L, 1_770_000_000_000_000L, 0L), // corrupt sentinel end=0
                 (2L, 10L, 3L),                    // small inversion
                 (3L, 1L, 9L))                     // sane: contains t=5
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, Seq.empty, "t", "s", "e",
      binWidth = 10L, maxBinsPerInterval = 1000L)
    assert(pairs(got, "pid", "iid") == Set((1L, 3L)))
    // overlap mode: the inverted interval matches nothing either, even
    // though the raw inequality (ls <= re AND rs <= le) would accept it
    val l = Seq((1L, 2L, 9L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 5L, 3L)).toDF("rid", "rs", "re")
    val ov = RangeJoin.overlap(l, r, Seq.empty, "ls", "le", "rs", "re", 10L)
    assert(ov.count() == 0L)
  }

  test("reserved working-column names are rejected") {
    val sp = spark; import sp.implicits._
    val p = Seq((1L, 5L)).toDF("__bin", "t")
    val iv = Seq((1L, 0L, 9L)).toDF("iid", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, iv, Seq.empty, "t", "s", "e", 10L)
    }
  }

  test("plan is an equi-join — no BroadcastNestedLoop, no cartesian") {
    val (points, intervals) = corpora
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "t", "s", "e", 50L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val naive = points.as("l").join(intervals.as("r"),
      col("l.key") === col("r.key") &&
        col("l.t") >= col("r.s") && col("l.t") <= col("r.e"))
      .queryExecution.executedPlan.toString
    // the shape this operator exists to avoid: Spark's own plan for the
    // same predicate keeps the range condition out of the join keys
    assert(naive.contains("BroadcastHashJoin") ||
      naive.contains("SortMergeJoin"), naive)
  }

  test("non-integral range columns are rejected") {
    val sp = spark; import sp.implicits._
    val p = Seq((1L, 1.5)).toDF("pid", "t")
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, iv, Seq.empty, "t", "s", "e", 10L)
    }
    assert(ex.getMessage.contains("integral"))
  }
}
