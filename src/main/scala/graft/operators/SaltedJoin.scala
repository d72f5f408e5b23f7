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

    val lhs = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq :+ spark_partition_id(): _*),
        lit(salts)))
    val rhs = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    lhs.join(rhs, (on :+ "__salt").toSeq, "inner")
      .select(left.columns.map(col).toSeq ++ rightOut.map(col): _*)
  }
}
