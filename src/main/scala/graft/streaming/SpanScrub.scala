package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming ExactSubstr span scrub (q65): d19's corpus-duplicated
  * span removal enforced on ARRIVING documents — the fourth member of
  * the "batch-derived curation relation, streaming enforcement" family
  * (q62 decontamination grams, q63 duplicated lines, q64 image band
  * index). The static relation is the corpus-wide duplicated-shingle
  * index (the nightly-batch product, bounded by distinct repeated
  * shingles); each arriving doc's qualifying spans and word-level
  * rewrite accounting are computed batch-locally.
  *
  * STATELESS by construction: a document is one input row, so its
  * shingle/word explodes, the index join, both run windows (partitioned
  * by doc_id), the ×3 word expansion, and the per-doc rollup never span
  * micro-batches — boundaries are semantically invisible (proven in
  * SpanScrubSpec by re-chunking). No state store, no watermark.
  *
  * 100 TB design: the index join is a stream-static equi-join on the
  * shingle hash (broadcast when the index fits, shuffled otherwise —
  * no forced hint); windows partition by doc_id, so their state is one
  * document's positions; everything else is per-batch map/aggregate.
  */
object SpanScrub {

  private val P = 2147483647L // Mersenne prime, shared with the batch Dial

  /** Per-document span-scrub records for one (micro-)batch against the
    * static duplicated-shingle index `dup` (one column `h`):
    * (doc_id, n_w, n_rm, kept_digest) with d19's exact arithmetic —
    * words covered by a >= `minWords`-word run of corpus-duplicated
    * shingles are removed, the kept word sequence is digested
    * order-sensitively — so the rolled-up stream output hash-matches
    * the batch operator.
    *
    * `shExpr` must produce the positional shingle-hash array (h*2^20+i)
    * and `wordExpr` the positional word-hash array, both over `text`
    * with the SAME tokenization (shingle position i covers word
    * positions i..i+2).
    */
  def perDocRecords(batch: DataFrame, dup: DataFrame, shExpr: String,
      wordExpr: String, minWords: Int): DataFrame = {
    // qualifying dup positions: maximal runs of consecutive
    // corpus-duplicated shingle positions spanning >= minWords words
    val dex = batch
      .where("size(split(text, ' ')) >= 3")
      .selectExpr("doc_id", s"$shExpr AS hl")
      .selectExpr("doc_id", "explode(hl) AS e")
      .selectExpr("doc_id", "(e div 1048576) AS h", "(e % 1048576) AS pos")
      .join(dup.select("h"), Seq("h"), "left_semi")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = dex.withColumn("grp",
      col("pos") - row_number().over(byDoc))
    val qq = runs.withColumn("rlen",
        count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
      .where(col("rlen") + 2 >= minWords)
      .select("doc_id", "pos")
    // a qualifying run's word coverage = the union of its member
    // shingles' 3-word windows (positions are consecutive, so this is
    // exactly [min_pos, max_pos + 2]) — a bounded ×3 explode, never a
    // range join; one explode keeps qq single-reference (no per-batch
    // cache needed, unlike d19's thrice-referenced SQL CTE)
    val rw = qq
      .selectExpr("doc_id", "explode(array(pos, pos + 1, pos + 2)) AS wpos")
      .distinct()
    val words = batch
      .where("size(split(text, ' ')) >= 1")
      .selectExpr("doc_id", s"$wordExpr AS wl")
      .selectExpr("doc_id", "explode(wl) AS e")
      .selectExpr("doc_id", "(e div 1048576) AS wh", "(e % 1048576) AS wpos")
    words
      .join(rw.withColumn("is_rm", lit(1)), Seq("doc_id", "wpos"),
        "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_w"),
        sum(when(col("is_rm").isNotNull, 1L).otherwise(0L)).as("n_rm"),
        (sum(when(col("is_rm").isNull,
          ((col("wpos") + 1) * (col("wh") % 1000003)) % P)
          .otherwise(0L)) % P).as("kept_digest"))
  }
}
