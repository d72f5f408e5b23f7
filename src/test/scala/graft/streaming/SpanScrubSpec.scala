package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Intent tests for the streaming span scrub (q65): the per-batch
  * records are boundary-independent (re-chunking the same corpus into
  * different micro-batches yields identical per-doc rows), and the
  * scrub cuts exactly the words covered by qualifying (>= 8-word)
  * corpus-duplicated spans while keeping scattered shared shingles.
  * The q65 oracle proves end-to-end stream ≡ batch-d19 at sf0.01;
  * these pin the per-batch function's contract in isolation.
  */
class SpanScrubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("span-scrub-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("per-doc records are micro-batch-boundary independent; block cut, scatter kept") {
    val sp = spark; import sp.implicits._
    val block = (1 to 10).map(i => s"q$i").mkString(" ") // 10-word block
    val docs = Seq(
      (1L, s"aa bb $block cc"),                           // 13 w, 10 cut
      (2L, s"$block zz ww"),                              // 12 w, 10 cut
      (3L, "x1 x2 cm1 cm2 cm3 x3 x4 cm4 cm5 cm6 x5"),     // scattered: 0 cut
      (4L, "y1 cm1 cm2 cm3 y2 y3 cm4 cm5 cm6 y4"),        // scattered: 0 cut
      (5L, "e1 e2 e3 e4 e5 e6"))                          // unique: 0 cut
    val all = docs.toDF("doc_id", "text")
    // the static index: shingle hashes in >= 2 distinct docs (as the
    // batch d19 index pass derives it)
    val dup = all.selectExpr("doc_id",
        s"explode(${graft.queries.ExtQueries.spanScrubShExpr}) AS e")
      .selectExpr("doc_id", "(e div 1048576) AS h")
      .distinct()
      .groupBy("h").count().where("count >= 2").select("h")

    def run(df: org.apache.spark.sql.DataFrame) =
      SpanScrub.perDocRecords(df, dup,
        graft.queries.ExtQueries.spanScrubShExpr,
        graft.queries.ExtQueries.spanScrubWordExpr,
        graft.queries.ExtQueries.spanScrubMinWords)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet

    val whole = run(all)
    // re-chunk: batches {1,4} / {2,5} / {3} — same records
    val chunks = Seq(Seq(1L, 4L), Seq(2L, 5L), Seq(3L))
      .map(ids => all.where(ids.map(i => s"doc_id = $i").mkString(" OR ")))
    val rechunked = chunks.map(run).reduce(_ ++ _)
    assert(whole == rechunked)

    // scrub semantics: the contiguous block is cut from both carriers;
    // scattered shared shingles and unique docs keep every word
    val byDoc = whole.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byDoc(1L) == (13L, 10L), s"doc 1: ${byDoc(1L)}")
    assert(byDoc(2L) == (12L, 10L), s"doc 2: ${byDoc(2L)}")
    assert(byDoc(3L) == (11L, 0L) && byDoc(4L) == (10L, 0L) &&
      byDoc(5L) == (6L, 0L))
    // kept digests: non-zero for every doc with kept words
    assert(whole.forall(_._4 != 0L))
  }
}
