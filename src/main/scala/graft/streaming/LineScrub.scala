package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming line-level scrub (q63): d18's duplicated-line index
  * enforced on arriving documents — the "batch-derived curation
  * relation, streaming enforcement" shape (q62's decontamination grams,
  * q59's band keys). Per micro-batch this is STATELESS: a document is
  * one input row, so its segment explode, index join, and per-doc
  * rollup are all batch-local — micro-batch boundaries are
  * semantically invisible and the appended per-doc records are
  * boundary-independent by construction (proven in LineScrubSpec by
  * re-chunking the same corpus).
  *
  * 100 TB design: the duplicated-line index is bounded by distinct
  * duplicated lines (broadcast when it fits; a shuffled stream-static
  * equi-join otherwise); everything else is per-batch map/aggregate
  * work with no state store at all.
  */
object LineScrub {

  private val P = 2147483647L // Mersenne prime, shared with the batch Dial

  /** Per-document scrub records for one (micro-)batch of documents
    * against the static duplicated-line index `dup` (one column `h` of
    * duplicated 10-word-line polyhashes): (doc_id, n_seg, n_rm,
    * kept_digest) with d18's exact digest arithmetic, so the rolled-up
    * stream output hash-matches the batch operator.
    */
  def perDocRecords(batch: DataFrame, dup: DataFrame,
      segExpr: String): DataFrame =
    batch.where("size(split(lower(text), ' ')) >= 1")
      .selectExpr("doc_id", s"$segExpr AS hl")
      .selectExpr("doc_id", "explode(hl) AS e")
      .selectExpr("doc_id", "(e div 1048576) AS h", "(e % 1048576) AS pos")
      // no broadcast hint: the index is broadcastable when small (the
      // planner's stats decide) but at the documented 100 TB design
      // point a corpus-sized duplicated-line index must be free to
      // fall back to a shuffled equi-join instead of OOMing a forced
      // broadcast
      .join(dup.select(col("h"), lit(1).as("is_dup")),
        Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_seg"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_rm"),
        (sum(when(col("is_dup").isNull,
          ((col("pos") + 1) * (col("h") % 1000003)) % P)
          .otherwise(0L)) % P).as("kept_digest"))
}
