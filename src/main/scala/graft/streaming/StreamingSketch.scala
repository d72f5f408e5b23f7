package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming HyperLogLog register maintenance — the streaming twin of
  * the batch cardinality sketch (p11): a live distinct-count estimate
  * per group over an unbounded event stream, without a seen-set.
  *
  * Shape: the same exact-integer hash/bucket/rho pipeline as the batch
  * sketch (shared constants, CASE-chain rho — both sides compute
  * identical registers by construction), shuffled on (group, bucket),
  * then ONE `flatMapGroupsWithState` stage holding the register value
  * `mj` and emitting a `RegisterRaise` row ONLY when a batch raises it.
  * Register values are monotone, so the raise log is append-mode-safe
  * by construction and consumers recover the current registers with a
  * `MAX(mj)` per (group, bucket) at any point — no windowed
  * aggregation, no end-of-stream flush problem, no update-mode sink.
  *
  * 100 TB / unbounded-stream design:
  * - State is EXACTLY the sketch: one int per (group, bucket) —
  *   m = 64 registers per group regardless of stream length; no
  *   timeout is needed because the state cannot grow past groups × m.
  * - Each register raises at most 26 times EVER (mj is monotone in
  *   [1, 26]), so the emitted log is bounded by groups × m × 26 rows
  *   for the stream's lifetime — the sink stays tiny at any rate.
  * - The raise log is a CRDT-style monotone stream: replays and
  *   reordering cannot corrupt the readout (MAX is idempotent and
  *   commutative), which is what makes the sink exactly-once-trivial.
  * - Batch parity: on a batch DataFrame the same hash/rho pipeline
  *   aggregates to identical registers (the oracle formulation);
  *   stream and batch agree bit-for-bit.
  */
object StreamingSketch {

  final case class RegRow(event_type: String, bucket: Long, rho: Int)
  final case class RegState(mj: Int)
  final case class RegisterRaise(event_type: String, bucket: Long, mj: Int)

  private val P = 2147483647L // Mersenne prime, shared with the batch Dial

  /** rho = 25-bit leading-zero rank + 1 (26 when the rest bits are 0) —
    * the same exact-integer CASE chain as the batch sketch.
    */
  private val RhoCase: String = (1 to 25)
    .map(j => s"WHEN rest >= ${1L << (25 - j)} THEN $j").mkString(" ")

  /** Per-micro-batch count-min partial: the 3×512-cell sketch of ONE
    * batch's keys. Partials merge by cell-wise SUM (counts are linear),
    * so a stream maintains the sketch by appending each batch's partial
    * to a log — stateless (no flatMapGroupsWithState at all), and the
    * readout is independent of micro-batch boundaries because
    * SUM(partials) = the batch sketch of the union. This is exactly how
    * a 100 TB pipeline keeps CMS per shard/day and merges at read time.
    * Works on any batch DataFrame with (user_id BIGINT).
    */
  def cmsPartial(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    import spark.implicits._
    val hashes = Seq((0, 1299721L, 1299827L), (1, 2750161L, 2750357L),
      (2, 4256233L, 4256249L)).toDF("i", "a", "b")
    batch.select(col("user_id").as("k"))
      .crossJoin(broadcast(hashes))
      .select(col("i"),
        (((col("k") % P) * col("a") + col("b")) % P % 512).as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
  }

  /** `events` needs (event_type STRING, user_id BIGINT). Works on a
    * batch DataFrame too (same plan minus state) for parity checks.
    */
  def hllRegisterRaises(events: DataFrame): Dataset[RegisterRaise] = {
    val spark = events.sparkSession
    import spark.implicits._
    val rows = events
      .selectExpr("event_type", s"((user_id % $P) * 2654435761) % $P AS hv")
      .selectExpr("event_type", "hv % 64 AS bucket",
        s"(hv div 64) AS rest")
      .selectExpr("event_type", "bucket",
        s"CAST((CASE $RhoCase ELSE 26 END) AS INT) AS rho")
      .as[RegRow]
    rows.groupByKey(r => (r.event_type, r.bucket))
      .flatMapGroupsWithState[RegState, RegisterRaise](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rs: Iterator[RegRow],
            state: org.apache.spark.sql.streaming.GroupState[RegState]) =>
          val maxRho = rs.map(_.rho).max
          val cur = state.getOption.map(_.mj).getOrElse(0)
          if (maxRho > cur) {
            state.update(RegState(maxRho))
            Iterator.single(RegisterRaise(key._1, key._2, maxRho))
          } else Iterator.empty
      }
  }
}
