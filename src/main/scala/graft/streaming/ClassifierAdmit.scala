package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming classifier admission (q70): t20's LEARNED quality scorer
  * applied at INGEST — the "train once, serve many" model relation
  * enforced the moment a document arrives, completing the
  * streaming-enforcement family for LEARNED scorers (q62 enforces
  * decontamination grams, q63 duplicated lines, q64 band keys, q65
  * duplicated spans — all rule-derived; this one serves a TRAINED
  * model). Per micro-batch this is STATELESS: a document is one input
  * row, so its tokenize, the broadcast join against the weight
  * relation, and the per-doc integer-mean score are all batch-local —
  * micro-batch boundaries are semantically invisible and the appended
  * per-doc verdicts are boundary-independent by construction (proven
  * in ClassifierAdmitSpec by re-chunking the same corpus).
  *
  * 100 TB design: the weight relation is the model constant (<= 1024
  * rows at ANY corpus size — broadcast), scoring is one map-side
  * tokenize plus two partial-aggregable per-doc aggregates; no state
  * store, no watermark, nothing grows with history.
  */
object ClassifierAdmit {

  /** Per-document admission verdicts for one (micro-)batch against the
    * static learned weight relation `weights` (bucket, w — t19's
    * materialized final epoch): (doc_id, score, cls) with t20's exact
    * integer arithmetic (score = x-weighted mean of bucket weights,
    * truncating `div`; class = sign), so the rolled-up stream output
    * hash-matches the batch scorer.
    */
  def perDocScores(batch: DataFrame, weights: DataFrame): DataFrame =
    batch
      .selectExpr("doc_id", "explode(split(lower(text), ' ')) AS w")
      .where("w <> ''")
      .selectExpr("doc_id", "graft_polyhash(w) % 1024 AS bucket")
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).cast("long").as("x"))
      .join(broadcast(weights.select(col("bucket"), col("w"))), Seq("bucket"))
      .groupBy("doc_id")
      .agg(expr("CAST(CAST(SUM(x * w) AS BIGINT) div CAST(SUM(x) AS BIGINT)" +
        " AS BIGINT)").as("score"))
      .selectExpr("doc_id", "score",
        "CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS BIGINT) AS cls")
}
