package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import EventStreams.Event

class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("event-streams-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourlyCounts over a MemoryStream emits watermark-complete windows") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 2, "click", 2.0),
        Event(3, ts(65), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark past hour 0 + 2h watermark
      input.addData(Event(4, ts(200), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = sp.sql("SELECT etype, cnt, val_c FROM hourly ORDER BY etype").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("click", 2L, 300L)))
    } finally q.stop()
  }

  test("hourlyCounts is the same plan in batch mode (stream/batch parity)") {
    val sp = spark
    import sp.implicits._
    val batch = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 2, "click", 2.0),
      Event(3, ts(65), 1, "view", 3.0)).toDF()
    val got = EventStreams.hourlyCounts(batch)
      .orderBy("h", "etype")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("click", 2L, 300L), ("view", 1L, 300L)))
  }

  test("dedupByIds drops re-delivered ids across micro-batches, state watermark-bounded") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupByIds(input.toDF(), "30 minutes", "event_id")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // same-batch duplicate
        Event(2, ts(2), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(
        Event(1, ts(5), 1, "click", 1.0), // re-delivery, within watermark
        Event(3, ts(6), 3, "click", 3.0))
      q.processAllAvailable()
      val ids = sp.sql("SELECT event_id FROM deduped")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("attributePurchases: watermarked stream-stream join matches batch") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val events = Seq(
      Event(1, ts(0), 1, "click", 0.0),
      Event(2, ts(20), 1, "click", 0.0),
      Event(3, ts(25), 1, "purchase", 9.99),  // attributes to clicks 1,2
      Event(4, ts(10), 2, "click", 0.0),
      Event(5, ts(55), 2, "purchase", 5.0),   // click 4 is 45min old: none
      Event(6, ts(30), 3, "view", 0.0),
      Event(7, ts(31), 3, "purchase", 1.0))   // views never attribute
    val expected = Set((3L, 1L, 1L), (3L, 1L, 2L)) // (purchase, user, click)

    // batch mode
    val batch = EventStreams.attributePurchases(events.toDF())
      .select("purchase_id", "user_id", "click_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(batch == expected)

    // streaming mode: same operator over a MemoryStream; late data past
    // the watermark horizon flushes the join state
    val input = MemoryStream[Event]
    val q = EventStreams.attributePurchases(input.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to emit all joined rows
      input.addData(Event(99, ts(600), 9, "view", 0.0))
      q.processAllAvailable()
      val got = sp.table("attrib")
        .select("purchase_id", "user_id", "click_id").as[(Long, Long, Long)]
        .collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("sessionize closes sessions on gap timeout") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at minute 0, 10 (one session), then 100 (new session)
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(100), 1, "view", 3.0))
      q.processAllAvailable()
      // push watermark far forward so the second session times out too
      input.addData(Event(4, ts(500), 2, "click", 0.5))
      q.processAllAvailable()
      input.addData(Event(5, ts(1000), 2, "click", 0.5))
      q.processAllAvailable()
      val rows = sp.sql(
        "SELECT user_id, n_events, total_value FROM sessions WHERE user_id = 1 ORDER BY start_ts")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(rows == Seq((1L, 2, 3.0), (1L, 1, 3.0)))
    } finally q.stop()
  }
}
