package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online near-duplicate detection over a document stream — the
  * streaming twin of the batch MinHash-LSH dedup (d03): an incoming
  * crawl is checked against everything already admitted inside a
  * bounded time horizon, per micro-batch, without re-scanning the
  * corpus.
  *
  * Shape: text → shingle hashes → 16-permutation MinHash signature
  * (the same codegen `graft_*` expressions the batch query uses, so
  * stream and batch agree on what "near-dup" means) → 4 banded keys →
  * shuffle on the band key → `flatMapGroupsWithState` keeping ONE
  * value per band key: the first-admitted doc id. A later document
  * sharing any band key is emitted as a `DupHit` against that first
  * doc. Emitting hits (not survivors) keeps the operator append-mode
  * with a single stateful stage — no chained stateful aggregation to
  * reason about; consumers anti-join the hit stream to drop dups.
  *
  * 100 TB / unbounded-stream design:
  * - State per band key is O(1) (`firstDoc`), NOT a seen-set; total
  *   state is bounded by distinct band keys inside the TTL horizon,
  *   and each key expires via event-time timeout `stateTtlMs` after
  *   its newest occurrence — state is (arrival rate × horizon), never
  *   stream length.
  * - The band key is the shuffle key, same as the batch LSH bucket —
  *   hot keys are exactly the batch query's hot buckets, and the
  *   per-key state stays O(1) no matter how many dups flood one key
  *   (each flood row emits one hit and leaves state untouched).
  * - Late rows beyond the watermark are dropped by the watermark
  *   filter before the stateful operator, so replayed history cannot
  *   resurrect expired state. NOTE the boundary is inclusive: Spark
  *   drops rows with ts <= watermark, and the INITIAL watermark is 0 —
  *   a row at exactly epoch 0 (or exactly at the current watermark in
  *   a later batch) never reaches the state op. Callers' event times
  *   must be strictly positive.
  *
  * Works on a batch DataFrame too (same plan minus state/timeouts),
  * which the spec uses for stream/batch parity.
  */
object StreamingDedup {

  final case class BandRow(doc_id: Long, ts: Timestamp, band: Int, bk: String)
  final case class BandState(firstDoc: Long)
  final case class DupHit(doc_id: Long, dup_of: Long, band: Int, ts: Timestamp)

  /** 4 bands × 4 rows over the 16-long MinHash signature. */
  private val BandExprs: String = (0 until 4).map { k =>
    val rows = (0 until 4).map(r => s"sig[${4 * k + r}]").mkString(", ")
    s"concat_ws(':', $rows)"
  }.mkString(", ")

  /** Emits one `DupHit` per (later doc, band) whose band key was
    * already claimed by an earlier doc inside the TTL horizon. Ties
    * inside one micro-batch break deterministically by (ts, doc_id).
    *
    * `docs` needs (doc_id BIGINT, ts TIMESTAMP, text STRING).
    */
  def nearDupPairs(docs: DataFrame, watermark: String = "1 hour",
      stateTtlMs: Long = 2L * 3600 * 1000): Dataset[DupHit] = {
    val spark = docs.sparkSession
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
    import spark.implicits._
    val streaming = docs.isStreaming
    val wm = if (streaming) docs.withWatermark("ts", watermark) else docs
    val banded = wm
      .where("size(graft_shingle_hashes(text)) >= 1")
      .selectExpr("doc_id", "ts",
        "graft_minhash_sig(graft_shingle_hashes(text)) AS sig")
      .selectExpr("doc_id", "ts",
        s"posexplode(array($BandExprs)) AS (band, bk)")
      .selectExpr("doc_id", "ts", "band", "concat_ws(':', band, bk) AS bk")
      .as[BandRow]
    banded.groupByKey(_.bk)
      .flatMapGroupsWithState[BandState, DupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rs = rows.toArray.sortBy(r => (r.ts.getTime, r.doc_id))
            var first = state.getOption.map(_.firstDoc)
            val out = Array.newBuilder[DupHit]
            rs.foreach { r =>
              first match {
                case None => first = Some(r.doc_id)
                case Some(f) if f != r.doc_id =>
                  out += DupHit(r.doc_id, f, r.band, r.ts)
                case _ => ()
              }
            }
            state.update(BandState(first.get))
            // batch mode has no watermark to time out against
            if (streaming)
              state.setTimeoutTimestamp(rs.map(_.ts.getTime).max + stateTtlMs)
            out.result().iterator
          }
      }
  }
}
