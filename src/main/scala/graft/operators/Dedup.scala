package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed dedup graph operators. */
object Dedup {

  /** Connected components of an undirected pair list `(i, j)` by the
    * alternating large-star/small-star algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC 2014).
    * Returns `(id, comp)` where `comp` is the component's min node id.
    *
    * Each round halves star depth (large-star hangs every node's larger
    * neighbors off its neighborhood min; small-star then re-hangs the
    * smaller neighbors), so convergence takes O(log n) rounds regardless
    * of component DIAMETER — min-label propagation (the previous
    * implementation here, and the GraphX default) needs O(diameter)
    * rounds, which goes superlinear exactly when a dup-flood corpus
    * chains giant components together (measured: 100x-replicated
    * documents collapse LSH buckets across replicas into ~100x-size
    * components; see SCALE.md).
    *
    * 100 TB shape: each round is two groupBy-min + join pairs over the
    * edge set, all hash-partitioned on node id — no collect_list
    * neighborhoods (a hub node's edges stream through the shuffle; its
    * neighborhood never materializes in one task). localCheckpoint per
    * round truncates the iterative lineage (driver OOM by ~10 rounds
    * otherwise); at cluster scale substitute reliable checkpoint().
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val p = pairs.select(col(pairs.columns(0)).as("u"), col(pairs.columns(1)).as("v"))
    val nodes = p.select(col("u").as("id")).union(p.select(col("v").as("id")))
      .distinct().localCheckpoint(true)
    // canonical undirected edge set; self-loops contribute membership
    // (via `nodes`) but no connectivity
    var edges = p.where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint(true)
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: every node connects its strictly-larger neighbors to
      // min(self ∪ neighborhood)
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lmin = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = nbrs.join(lmin, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct().localCheckpoint(true)
      // small-star: every node re-hangs itself and its smaller neighbors
      // off the min of those — emitted edges are always (child, parent)
      // with parent < child
      val nbrs2 = ls.union(ls.select(col("v").as("u"), col("u").as("v")))
      val smaller = nbrs2.where(col("v") < col("u"))
      val smin = smaller.groupBy("u").agg(min("v").as("m"))
      val ss = smaller.join(smin, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(smin.select(col("u"), col("m").as("v")))
        .distinct().localCheckpoint(true)
      // exact fixed-point check (set equality) — no label-sum probe that
      // could wrap at hash-range ids and alias distinct states. Both
      // sides are distinct sets, so equal counts + one-sided containment
      // is full equality; this runs one distributed anti-join per round
      // instead of two (counts on checkpointed data are near-free).
      converged = ss.count() == edges.count() && ss.exceptAll(edges).isEmpty
      edges = ss
      iter += 1
    }
    // fixed point is a star forest: (child, component-min) per non-root.
    // group-min guards the maxIter-cutoff case where a node still carries
    // two candidate parents; roots and edge-less nodes label themselves.
    val stars = edges.groupBy("u").agg(min("v").as("comp"))
      .withColumnRenamed("u", "sid")
    nodes.join(stars, col("id") === col("sid"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
