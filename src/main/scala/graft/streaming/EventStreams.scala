package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream table.
  *
  * The reference engine has no streaming surface (SURVEY.md §2.2); these
  * are north-star extensions built on watermarks + windowed state so they
  * run identically over a `readStream` source at cluster scale: state is
  * partitioned by key, watermarks bound it, nothing accumulates on the
  * driver.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(
      user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
      n_events: Int, total_value: Double)

  final case class SessionState(
      start: Long, last: Long, n: Int, total: Double)

  /** Tumbling 1-hour windows with a 2-hour watermark: the streaming
    * equivalent of q17_events_hourly. Works on both batch and streaming
    * DataFrames (same plan, Catalyst picks the mode). Pass
    * `watermarked = true` when composing after another stateful operator
    * (e.g. `dedupByIds`) that already defined the event-time watermark —
    * redefining it downstream is disallowed.
    */
  def hourlyCounts(events: DataFrame, watermarked: Boolean = false): DataFrame =
    (if (watermarked) events else events.withWatermark("ts", "2 hours"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(ROUND(value * 100) AS BIGINT)")).as("val_c"))
      .select(col("window.start").as("h"), col("event_type").as("etype"),
        col("cnt"), col("val_c"))

  /** Streaming exact dedup on ingest — the training-pipeline shape:
    * drop re-delivered/duplicate records (same id) inside the watermark
    * horizon. `dropDuplicatesWithinWatermark` keys state by id and the
    * watermark expires it, so state is bounded by (arrival rate ×
    * horizon), never by stream length. Works identically over the
    * columnfile `readStream` source.
    */
  def dedupByIds(events: DataFrame, watermark: String, ids: String*): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(ids.head, ids.tail: _*)

  /** Stream-stream interval join: each purchase attributed to the same
    * user's clicks in the preceding `windowMinutes`. Both sides carry
    * watermarks and the join condition bounds event time on both sides,
    * so Spark derives finite state retention for each input — the
    * canonical watermarked stream-stream join. State per side is
    * (arrival rate × window + watermark), independent of stream length;
    * the join itself shuffles both streams on `user_id`.
    *
    * Works identically over batch DataFrames (same plan, no state),
    * which is what the oracle-gated batch twin `q44` verifies.
    */
  def attributePurchases(events: DataFrame, windowMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"),
        expr("CAST(ROUND(p_value * 100) AS BIGINT)").as("p_value_c"))
  }

  /** Gap-based sessionization with explicit keyed state
    * (flatMapGroupsWithState + event-time timeout): emits a session once
    * `gapMinutes` passes with no activity for the user. State per key is
    * O(1); timeouts are driven by the watermark.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(
              userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
