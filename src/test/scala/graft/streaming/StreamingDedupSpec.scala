package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

object StreamingDedupSpec {
  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
}

class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {
  import StreamingDedupSpec.Doc

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("streaming-dedup-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val nearVariant =
    "the quick brown fox jumps over the lazy dog near the river bank tonight"
  private val unrelated =
    "colorless green ideas sleep furiously while the compiler emits warnings"

  test("exact and near duplicates emit hits across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(input.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dup_hits")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, ts(0), base),
        Doc(2, ts(1), base), // same-batch exact dup of 1
        Doc(3, ts(2), unrelated))
      q.processAllAvailable()
      input.addData(
        Doc(4, ts(5), base), // cross-batch exact dup of 1
        Doc(5, ts(6), nearVariant)) // near-dup: shares >=1 of 4 bands
      q.processAllAvailable()
      val pairs = sp.sql(
        "SELECT DISTINCT doc_id, dup_of FROM dup_hits").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((2L, 1L), (4L, 1L), (5L, 1L)),
        s"unexpected hit pairs: $pairs")
      // exact dups collide on all 4 bands, the near variant on fewer
      val bandsOf = sp.sql(
        "SELECT doc_id, COUNT(DISTINCT band) FROM dup_hits GROUP BY doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bandsOf(2L) == 4 && bandsOf(4L) == 4)
      assert(bandsOf(5L) >= 1 && bandsOf(5L) < 4)
    } finally q.stop()
  }

  test("band-key state expires by event-time TTL (re-sent text is a fresh first)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Doc]
    // 10-minute watermark, 20-minute TTL
    val q = StreamingDedup.nearDupPairs(input.toDF(), "10 minutes",
        stateTtlMs = 20L * 60 * 1000)
      .writeStream.format("memory").queryName("dup_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Doc(1, ts(0), base))
      q.processAllAvailable()
      // advance the watermark far past ts(0) + TTL: state for base expires
      input.addData(Doc(2, ts(120), unrelated))
      q.processAllAvailable()
      input.addData(Doc(3, ts(125), base)) // same text, expired horizon
      q.processAllAvailable()
      val hits = sp.sql("SELECT doc_id FROM dup_ttl").collect()
      assert(hits.isEmpty,
        s"expected no hits after state TTL, got: ${hits.mkString(",")}")
      // and doc 3 now owns the state: a later dup hits doc 3, not doc 1
      input.addData(Doc(4, ts(126), base))
      q.processAllAvailable()
      val pairs = sp.sql("SELECT DISTINCT doc_id, dup_of FROM dup_ttl")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((4L, 3L)), s"unexpected pairs: $pairs")
    } finally q.stop()
  }

  test("batch parity: same operator over a batch DataFrame finds the same pairs") {
    val sp = spark
    import sp.implicits._
    val batch = Seq(
      Doc(1, ts(0), base),
      Doc(2, ts(1), base),
      Doc(3, ts(2), unrelated),
      Doc(5, ts(6), nearVariant)).toDF()
    val pairs = StreamingDedup.nearDupPairs(batch)
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 1L), (5L, 1L)), s"unexpected pairs: $pairs")
  }

  test("epoch-zero boundary: a row at exactly the initial watermark is dropped " +
    "(Spark semantics — callers must keep event times strictly positive)") {
    // Pins the behavior the round-12 fuzzer surfaced: Spark's
    // stateful-op late filter drops rows with ts <= watermark, and the
    // INITIAL watermark is 0 — so a doc at exactly epoch 0 never
    // reaches the state op, and its duplicate partner mis-claims the
    // band keys (emitting nothing). If a Spark upgrade changes the
    // boundary, this test fails and the q59-family fixtures can drop
    // their +1s shift.
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.nearDupPairs(input.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dup_epoch0")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Doc(1, new Timestamp(0L), base), // exactly epoch 0 == watermark
        Doc(2, new Timestamp(1000L), base))
      q.processAllAvailable()
      val pairs = sp.sql("SELECT DISTINCT doc_id, dup_of FROM dup_epoch0")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // doc 1 was dropped pre-state, so doc 2 claimed the keys: NO hit
      assert(pairs == Set.empty[(Long, Long)],
        s"epoch-0 row reached the state op (boundary changed?): $pairs")
      // a third duplicate hits doc 2 — proving doc 2 (not 1) owns state
      input.addData(Doc(3, new Timestamp(2000L), base))
      q.processAllAvailable()
      val pairs2 = sp.sql("SELECT DISTINCT doc_id, dup_of FROM dup_epoch0")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs2 == Set((3L, 2L)), s"unexpected pairs: $pairs2")
    } finally q.stop()
  }
}
