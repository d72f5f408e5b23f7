package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Intent tests for the streaming line scrub (q63): the per-batch
  * records are boundary-independent (re-chunking the same corpus into
  * different micro-batches yields identical per-doc rows), and the
  * scrub marks exactly the lines present in the static index. The q63
  * oracle proves end-to-end stream ≡ batch-d18 at sf0.01; these pin
  * the per-batch function's contract in isolation.
  */
class LineScrubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("line-scrub-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("per-doc records are micro-batch-boundary independent") {
    val sp = spark; import sp.implicits._
    val line = (1 to 10).map(i => s"l$i").mkString(" ")
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$line ${uniq("a", 10)}"),
      (2L, s"$line ${uniq("b", 10)}"),
      (3L, s"${uniq("c", 10)} $line"),
      (4L, uniq("d", 8)),
      (5L, s"e0 $line"))
    val all = docs.toDF("doc_id", "text")
    // the static index: the shared line's polyhash (as the batch d18
    // index pass would derive it)
    val dup = all.selectExpr(
      s"explode(${graft.queries.ExtQueries.lineScrubSegExpr}) AS e")
      .selectExpr("(e div 1048576) AS h")
      .groupBy("h").count().where("count >= 2").select("h")

    val seg = graft.queries.ExtQueries.lineScrubSegExpr
    def run(df: org.apache.spark.sql.DataFrame) =
      LineScrub.perDocRecords(df, dup, seg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet

    val whole = run(all)
    // re-chunk: batches {1,4} / {2,5} / {3} — same records
    val chunks = Seq(Seq(1L, 4L), Seq(2L, 5L), Seq(3L))
      .map(ids => all.where(ids.map(i => s"doc_id = $i").mkString(" OR ")))
    val rechunked = chunks.map(run).reduce(_ ++ _)
    assert(whole == rechunked)

    // scrub semantics: aligned carriers lose the line, others keep all
    val byDoc = whole.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byDoc(1L) == (2L, 1L) && byDoc(2L) == (2L, 1L) &&
      byDoc(3L) == (2L, 1L))
    assert(byDoc(4L) == (1L, 0L) && byDoc(5L) == (2L, 0L))
  }
}
