package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Intent tests for the streaming HyperLogLog register maintenance:
  * raises are emitted only when a micro-batch actually raises a
  * register (monotone, bounded log), and the raise log folds to the
  * same registers the batch pipeline computes (the q60 oracle proves
  * the same thing end-to-end through the cf source/sink at sf0.01).
  */
final case class Ev(event_type: String, user_id: Long)

class StreamingSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-sketch-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("register raises are monotone across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingSketch.hllRegisterRaises(input.toDF())
      .writeStream.format("memory").queryName("hll_raises")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L to 500L).map(u => Ev("x", u)): _*)
      q.processAllAvailable()
      val afterB1 = sp.sql("SELECT COUNT(*) FROM hll_raises")
        .head().getLong(0)
      // replaying the same users raises nothing (registers already there)
      input.addData((1L to 500L).map(u => Ev("x", u)): _*)
      q.processAllAvailable()
      val afterReplay = sp.sql("SELECT COUNT(*) FROM hll_raises")
        .head().getLong(0)
      assert(afterReplay == afterB1,
        s"replay emitted raises: $afterB1 -> $afterReplay")
      // new users may raise some registers, never lower any
      input.addData((501L to 2000L).map(u => Ev("x", u)): _*)
      q.processAllAvailable()
      val regs = sp.sql(
        """SELECT bucket, MAX(mj) AS mj FROM hll_raises
          |WHERE event_type = 'x' GROUP BY bucket""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val regsB1 = sp.sql(
        """SELECT bucket, mj FROM hll_raises
          |WHERE event_type = 'x'""".stripMargin)
        .collect().groupBy(_.getLong(0))
        .map { case (b, rows) => b -> rows.map(_.getInt(1)).min }
      regsB1.foreach { case (b, mjFirst) =>
        assert(regs(b) >= mjFirst, s"register $b lowered")
      }
      // folded registers equal the batch pipeline's over the union
      val batch = StreamingSketch.hllRegisterRaises(
        (1L to 2000L).map(u => Ev("x", u)).toDF())
        .groupBy($"event_type", $"bucket")
        .max("mj")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      val streamed = sp.sql(
        """SELECT event_type, bucket, MAX(mj) AS mj FROM hll_raises
          |GROUP BY event_type, bucket""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      assert(streamed == batch,
        "streamed registers diverge from batch registers")
    } finally q.stop()
  }
}
