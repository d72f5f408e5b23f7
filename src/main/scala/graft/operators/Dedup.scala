package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed dedup graph operators. */
object Dedup {

  /** Connected components of an undirected pair list `(i, j)` by
    * min-label propagation: every node starts labeled with its own id;
    * each round, a node's label becomes the min over itself and its
    * neighbors; fixed point reached in O(component diameter) rounds.
    * Returns `(id, comp)` where `comp` is the component's min node id.
    *
    * This is the iterated upgrade of the 1-hop min-over-neighbors
    * approximation used by d08: chained near-dups (A-B, B-C with A,C not
    * direct neighbors) land in ONE component here.
    *
    * 100 TB shape: each round is one shuffle join (edges x labels, keyed
    * on node id) plus a group-min — the standard large-graph CC loop
    * (GraphX/GraphFrames equivalent). Rounds are bounded by `maxIter`;
    * near-dup graphs have tiny diameters in practice (dup clusters are
    * dense), so the loop converges in a handful of rounds. Labels are
    * re-cached per round and the previous round unpersisted; at cluster
    * scale substitute `localCheckpoint` every few rounds to truncate
    * lineage (same discipline SCALE.md documents for d08's pair graph).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val p = pairs.select(col(pairs.columns(0)).as("i"), col(pairs.columns(1)).as("j"))
    val edges = p.select(col("i").as("a"), col("j").as("b"))
      .union(p.select(col("j").as("a"), col("i").as("b")))
      .cache()
    // localCheckpoint per round: iterative plans otherwise nest one
    // union-join-aggregate per iteration and the logical plan grows
    // exponentially (driver OOM by ~10 rounds). At cluster scale use
    // reliable checkpoint() to a checkpoint dir instead.
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val compType = labels.schema("comp").dataType
      // neighbor labels flow along edges; keep own label in the pool.
      // The node's own row carries its previous label as `old`, so the
      // group-min aggregate ALSO yields the previous label per node and
      // convergence is an exact changed-label check — no label-sum probe
      // (a sum can wrap at extreme id ranges and alias distinct states).
      val viaEdges = edges.join(labels, edges("b") === labels("id"))
        .select(edges("a").as("id"), col("comp"),
          lit(null).cast(compType).as("old"))
      val next = labels.select(col("id"), col("comp"), col("comp").as("old"))
        .union(viaEdges)
        .groupBy("id").agg(min("comp").as("comp"), max("old").as("old"))
        .localCheckpoint(true)
      converged = next.filter(col("comp") =!= col("old")).isEmpty
      labels = next.select("id", "comp")
      iter += 1
    }
    edges.unpersist()
    labels
  }
}
