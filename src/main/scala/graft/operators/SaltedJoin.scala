package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the standard remedy when one join
  * key carries a disproportionate share of the LEFT (fact) side and the
  * right side is too large to broadcast.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer:
  * at 100 TB a single pathological key (null-ish id, default value,
  * celebrity entity) turns a 1000-executor join into one straggler task.
  * AQE's skew-join split helps sort-merge joins whose skewed partition
  * is spillable, but does nothing when the skew is a single key inside
  * one partition that must still be processed by one task per match
  * group. Salting splits the key itself:
  *
  *  - each left row gets a deterministic salt in `[0, salts)` — a hash
  *    of the whole row MIXED WITH the input partition id, so
  *    re-computation under task retry is stable (same partition, same
  *    rows → same salts; no RNG state) while BYTE-IDENTICAL duplicate
  *    rows — the degenerate flood of a default-value hot key, where a
  *    row-content hash alone would assign every copy the same salt and
  *    re-create the single-reducer straggler — still spread across
  *    salts because they arrive in many input partitions;
  *  - the right side replicates each row `salts` times (one per salt);
  *  - the equi-join runs on (keys…, salt): the hot key's rows now spread
  *    over `salts` reducers, each joining against a full copy of that
  *    key's right rows.
  *
  * Cost: |R| · salts replicated rows through the shuffle — size `salts`
  * to the observed skew (a handful of straggler-splitting salts, not
  * hundreds). Semantically identical to the unsalted inner join: every
  * (l, r) key match meets in exactly one salt bucket (the left row's).
  *
  * Output = left columns then right's non-key columns (names must not
  * clash). Null keys match nothing, as in any SQL equi-join.
  */
object SaltedJoin {

  /** Auto-sized salting: measures the left side's key skew on a seeded
    * sample and derives `salts` from it, so callers don't hard-code a
    * replication factor that is wasted on uniform keys and too small on
    * pathological ones. Uniform keys pick 1 (the plain join, zero
    * replication cost); a hot key picks enough salts to split its
    * reducer down to the balanced per-reducer load, capped at
    * `maxSalts`.
    */
  def innerAuto(left: DataFrame, right: DataFrame, on: Seq[String],
      maxSalts: Int = 32, sampleFraction: Double = 0.05): DataFrame =
    inner(left, right, on, chooseSalts(left, on, maxSalts, sampleFraction))

  /** Sampled key histogram → salt count: the hottest key's sampled row
    * count versus the balanced per-reducer load (sampled total /
    * shuffle parallelism), clamped to [1, maxSalts]. One small
    * aggregate job at plan time (AQE-style runtime statistics); the
    * seeded Bernoulli sample is deterministic for a given input split
    * layout — the same stability contract the salt hash itself has.
    */
  def chooseSalts(left: DataFrame, on: Seq[String],
      maxSalts: Int = 32, sampleFraction: Double = 0.05): Int = {
    require(maxSalts > 0, "saltedJoin: maxSalts must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"saltedJoin: sampleFraction must be in (0, 1], got $sampleFraction")
    val parallelism =
      left.sparkSession.sessionState.conf.numShufflePartitions
    val stats = left.select(on.map(col): _*)
      .sample(withReplacement = false, sampleFraction, seed = 41L)
      .groupBy(on.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
      .head()
    if (stats.isNullAt(0)) 1 // empty sample: nothing to size against
    else {
      val mx = stats.getLong(0)
      val tot = stats.getLong(1)
      val balanced = math.max(1L, tot / math.max(1, parallelism))
      val want = math.ceil(mx.toDouble / balanced.toDouble).toLong
      math.max(1L, math.min(maxSalts.toLong, want)).toInt
    }
  }

  def inner(left: DataFrame, right: DataFrame, on: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "saltedJoin: salts must be positive")
    require(on.nonEmpty, "saltedJoin: need at least one equi-key")
    on.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"saltedJoin: equi-key $k missing from an input")
    }
    val rightOut = right.columns.toSeq.filterNot(on.contains)
    val clash = rightOut.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"saltedJoin: right columns clash with left: ${clash.mkString(", ")}")
    Reserved.check("saltedJoin", left.columns.toSeq ++ right.columns.toSeq)

    if (salts == 1) // no skew: the plain join, no salt column or replication
      return left.join(right, on, "inner")
        .select(left.columns.map(col).toSeq ++ rightOut.map(col): _*)

    val lhs = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq :+ spark_partition_id(): _*),
        lit(salts)))
    val rhs = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    lhs.join(rhs, (on :+ "__salt").toSeq, "inner")
      .select(left.columns.map(col).toSeq ++ rightOut.map(col): _*)
  }
}
