package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Distributed range (interval) join — match rows on `point ∈ [start,
  * end]` or `[ls, le] overlaps [rs, re]`, with optional equi-keys.
  *
  * Stock Spark plans a non-equi join condition as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side broadcasts): O(|L|·|R|)
  * comparisons per key, which is exactly the shape that dies first at
  * 100 TB. This operator turns the range predicate into an EQUI-join on
  * a bin key — the classic bucketed range-join formulation DuckDB (IEJoin
  * paper) and every interval-join engine use in distributed form:
  *
  *  1. pick a bin width `w` (same units as the range columns);
  *  2. each interval explodes into the bins it covers
  *     (`sequence(start div w, end div w)`), each point maps to its one
  *     bin (`t div w`);
  *  3. shuffle-equi-join on (keys…, bin) — Catalyst picks SMJ/BHJ and
  *     AQE handles skewed bins like any skewed join key;
  *  4. a residual filter re-checks the exact range predicate.
  *
  * A point meets an interval in exactly one bin (the point's), so
  * point-in-interval needs no dedup. Two overlapping intervals share
  * every bin in the intersection of their covered ranges; `overlap`
  * emits a pair only in the FIRST shared bin
  * (`bin == greatest(lStartBin, rStartBin)`), so each pair appears
  * exactly once without a distinct.
  *
  * Cost at scale: |R| · (avg interval length / w) replicated right rows
  * through one shuffle — the knob `binWidth` trades replication against
  * bin selectivity, and `maxBinsPerInterval` fails loudly (per row, with
  * the offending span) instead of letting one open-ended interval
  * explode a task. Binning uses truncating integer division (`div`) —
  * any monotone binning function is correct here; truncation vs floor
  * only shifts which bin straddles zero.
  *
  * Range columns must be integral (int/long/short/byte — convert
  * timestamps with `unix_micros` first): exact arithmetic, no float
  * rounding at bin edges. Null points/bounds match nothing (SQL BETWEEN
  * over inner join semantics). An INVERTED interval (end < start) is
  * the empty set — it matches nothing, where the naive inequality
  * formulation (`ls <= re AND rs <= le`) would accept some inverted
  * pairs; closed-interval semantics, chosen deliberately.
  */
object RangeJoin {

  private def requireIntegral(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach { c =>
      val t = df.schema(c).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(t),
        s"rangeJoin: column $c must be integral for exact binning, got $t" +
          " (convert timestamps with unix_micros first)")
    }

  private def checkShapes(left: DataFrame, right: DataFrame,
      on: Seq[String]): Unit = {
    on.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"rangeJoin: equi-key $k missing from an input")
    }
    val clash = right.columns.toSeq.filterNot(on.contains)
      .intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"rangeJoin: right columns clash with left: ${clash.mkString(", ")}")
    Reserved.check("rangeJoin", left.columns.toSeq ++ right.columns.toSeq)
  }

  /** Truncating exact bin of an integral column (`x div w`). */
  private def binOf(c: String, w: Long): Column =
    expr(s"CAST(`$c` AS BIGINT) div ${w}L")

  /** Bins covered by [start, end], failing per-row when the span
    * exceeds `maxBins` (one unbounded interval must not OOM a task).
    * An INVERTED interval (end < start) is the empty set under closed-
    * interval semantics — it generates no bins at all rather than
    * tripping Spark's `sequence(s, e)` into a DESCENDING sequence
    * (which would bypass the span guard and explode on a corrupt
    * sentinel like end=0).
    */
  private def binsOf(startCol: String, endCol: String, w: Long,
      maxBins: Long): Column = {
    val s = binOf(startCol, w)
    val e = binOf(endCol, w)
    val guarded = when(e - s >= lit(maxBins), raise_error(concat(
        lit(s"rangeJoin: interval spans >= $maxBins bins of width $w ("),
        col(startCol), lit(".."), col(endCol),
        lit("); raise binWidth or maxBinsPerInterval"))))
      .otherwise(e)
    when(col(endCol) < col(startCol), array().cast("array<bigint>"))
      .otherwise(sequence(s, guarded))
  }

  /** For each left row, every right row whose `[rightStart, rightEnd]`
    * contains `left.leftTime`, matched on the equi-keys `on` (may be
    * empty: pure range join). Inner; output = left columns then right's
    * non-key columns.
    */
  def pointInInterval(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightStart: String, rightEnd: String,
      binWidth: Long, maxBinsPerInterval: Long = 16384): DataFrame = {
    require(binWidth > 0, "rangeJoin: binWidth must be positive")
    checkShapes(left, right, on)
    requireIntegral(left, Seq(leftTime))
    requireIntegral(right, Seq(rightStart, rightEnd))

    val lhs = left.withColumn("__bin", binOf(leftTime, binWidth))
    val rhs = right.withColumn("__bin",
      explode(binsOf(rightStart, rightEnd, binWidth, maxBinsPerInterval)))
    val rightOut = right.columns.toSeq.filterNot(on.contains)
    lhs.join(rhs, (on :+ "__bin").toSeq, "inner")
      .where(col(leftTime) >= col(rightStart) &&
        col(leftTime) <= col(rightEnd))
      .select(left.columns.map(col).toSeq ++ rightOut.map(col): _*)
  }

  /** Every (left, right) pair whose closed intervals `[leftStart,
    * leftEnd]` and `[rightStart, rightEnd]` overlap, matched on the
    * equi-keys `on`. Each pair emitted exactly once (first-shared-bin
    * dedup), no distinct needed. Inner; output = left columns then
    * right's non-key columns.
    */
  def overlap(left: DataFrame, right: DataFrame, on: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long, maxBinsPerInterval: Long = 16384): DataFrame = {
    require(binWidth > 0, "rangeJoin: binWidth must be positive")
    checkShapes(left, right, on)
    requireIntegral(left, Seq(leftStart, leftEnd))
    requireIntegral(right, Seq(rightStart, rightEnd))

    val lhs = left
      .withColumn("__lb0", binOf(leftStart, binWidth))
      .withColumn("__bin",
        explode(binsOf(leftStart, leftEnd, binWidth, maxBinsPerInterval)))
    val rhs = right
      .withColumn("__rb0", binOf(rightStart, binWidth))
      .withColumn("__bin",
        explode(binsOf(rightStart, rightEnd, binWidth, maxBinsPerInterval)))
    val rightOut = right.columns.toSeq.filterNot(on.contains)
    lhs.join(rhs, (on :+ "__bin").toSeq, "inner")
      .where(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .select(left.columns.map(col).toSeq ++ rightOut.map(col): _*)
  }
}
