package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of join — for each left row, the single most recent
  * right row at or before the left row's time, matched on equi-keys.
  * The operator the reference engine (and stock Spark) lacks; DuckDB
  * and kdb ship it natively, and feature backfills / point-in-time
  * training joins need it constantly.
  *
  * NOT implemented as an inequality join: `l JOIN r ON key AND r.ts <=
  * l.ts` plus an argmax explodes into |matches| intermediate rows per
  * left row (a hot key with a million right rows produces a million
  * candidates per probe). Instead both sides are unioned and sorted
  * once per key — the canonical distributed formulation:
  *
  *  1. tag rows (right carries its payload, left carries its full row),
  *  2. one hash shuffle on the keys + one sort by (time, tag, payload),
  *  3. `last(payload, ignoreNulls)` over an unbounded-preceding running
  *     window carries the latest right payload forward,
  *  4. keep the left rows; their carried payload IS the as-of match.
  *
  * 100 TB shape: one shuffle + one per-partition sort, the same cost as
  * a sort-merge join of the two inputs — no candidate blowup, no
  * broadcast requirement, AQE-compatible. Skewed keys behave like any
  * skewed window (salt the key and merge runs if one entity dominates).
  *
  * Determinism: among right rows sharing (keys, time), the carried
  * payload is the struct-greatest one (the sort's final tiebreak), so
  * repeated runs and oracle comparisons see one canonical winner.
  *
  * `strict = false` admits right rows AT the left row's time
  * (`r.ts <= l.ts`); `strict = true` excludes them (`r.ts < l.ts`) by
  * flipping which side sorts first at equal times. Left rows with no
  * admissible right row come out with null payload columns
  * (left-outer; filter for inner semantics).
  */
object AsOfJoin {

  /** @param on        equi-key column names, present in both inputs
    * @param leftTime  left's event-time column
    * @param rightTime right's event-time column (same type as left's)
    *
    * Output: every `left` column, plus right's payload columns (all but
    * the keys and `rightTime`), which must not clash with left's names.
    */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      strict: Boolean = false): DataFrame = {
    require(on.nonEmpty,
      "asOf: empty key list would move the whole union into one " +
        "partition (Window.partitionBy() with no columns)")
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.toSeq
      .filterNot(c => on.contains(c) || c == rightTime)
    require(payloadCols.nonEmpty,
      "asOf: right side has no payload columns beyond keys and time")
    val clash = payloadCols.intersect(leftCols)
    require(clash.isEmpty,
      s"asOf: right payload columns clash with left: ${clash.mkString(", ")}")
    Reserved.check("asOf", left.columns ++ right.columns)

    val lRowType = StructType(leftCols.map(c => left.schema(c)))
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))
    // right rows must sort before left rows at equal time for <=
    // semantics, after them for strict <
    val rightTag = if (strict) 1 else 0

    val lhs = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1 - rightTag).as("__tag"),
        struct(leftCols.map(col): _*).as("__lrow"),
        lit(null).cast(payloadType).as("__pay")): _*)
    // SQL comparison semantics: a right row whose time is NULL satisfies
    // neither r.ts <= l.ts nor r.ts < l.ts, so it can never be a match.
    // Without this filter it would sort FIRST (nulls-first asc) and be
    // carried forward as a phantom match for every left row.
    val rhs = right.where(col(rightTime).isNotNull).select(
      on.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(rightTag).as("__tag"),
        lit(null).cast(lRowType).as("__lrow"),
        struct(payloadCols.map(col): _*).as("__pay")): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lhs.unionByName(rhs)
      .withColumn("__carried", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__lrow").isNotNull)
      .select(leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        payloadCols.map(c => col(s"__carried.$c").as(c)): _*)
  }
}
