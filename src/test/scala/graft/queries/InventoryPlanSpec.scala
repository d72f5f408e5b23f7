package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Inventory-wide physical-plan sweep — the class-level gate the
  * round-11 audit found missing: p02's `NOT IN` planned as a null-aware
  * anti join (NAAJ), which Spark executes ONLY as a broadcast
  * (BroadcastHashJoin with isNullAwareAntiJoin, BNLJ fallback)
  * regardless of `autoBroadcastJoinThreshold` — a 100 TB scale-killer
  * whenever the subquery relation is corpus-proportional. The per-round
  * sweep counted CartesianProduct and BNLJ nodes but a NAAJ surfaces as
  * a plain BroadcastHashJoinExec, so it slipped through. This spec
  * closes the blind spot for EVERY query in `SparkEntry.queries`:
  *
  *  - zero `BroadcastHashJoinExec(isNullAwareAntiJoin = true)`;
  *  - zero `CartesianProductExec`;
  *  - any `BroadcastNestedLoopJoinExec` must be an Inner/Cross join in
  *    the explicit allowlist of contract-bounded build sides (constant
  *    VALUES relations, query samples, centroid tables) — in
  *    particular, no Anti-typed BNLJ (the NAAJ fallback shape) anywhere.
  *
  * Construction-only: each query's DataFrame is built and its executed
  * plan collected, but never executed (stream-backed queries do run
  * their one-time ingest to produce the readout relation).
  */
class InventoryPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("inventory-plan-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // crisp plan trees
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Queries whose plans legitimately contain an Inner/Cross
    * BroadcastNestedLoopJoin over a CONSTANT-size build side: the
    * 3-row probe relations (p08/q61/p18), the LIMIT-bounded query
    * samples and ORDER BY clabel LIMIT 64 centroid relations of the
    * vector family, the 1-row `nb` sizing relation (v06), and t16's
    * BPE training rounds (LIMIT-1 merge picks + 1-row scalar
    * aggregates, adjudicated round 13). Since round 14 the value is a
    * MACHINE-CHECKED build-side row bound, not a bare allowlist entry
    * (round-13 advice): every BNLJ in the named query must have a
    * build side whose physical plan carries a provable static bound
    * <= the value. Retrofitting the check surfaced a REAL flipped
    * build side — v01/v07/v08 wrote the 5-row query sample on the
    * LEFT of the cross join, and with CBO off both sides' stats tie
    * (Filter keeps its child's sizeInBytes), so Spark's tie-break
    * broadcast the CORPUS side; the samples now carry ORDER BY/LIMIT
    * (an identity given the unique-id filter), which both fixes the
    * build-side choice via honest limit stats and makes the bound
    * provable from plan shape.
    */
  private val bnljAllowlist: Map[String, Long] = Map(
    "p08_sketch_heavy_hitters" -> 4L,
    "q61_stream_cms_sketch" -> 4L,
    "p18_bloom_membership" -> 4L,
    "v01_knn_brute" -> 64L,
    "v03_knn_ivf_assign" -> 64L,
    "v04_knn_ivf_search" -> 64L,
    "v06_ann_cap_report" -> 64L,
    "v07_knn_quantized" -> 64L,
    "v08_knn_rerank" -> 64L,
    "v09_ann_recall" -> 64L,
    "v10_ivf_recall" -> 64L,
    "v11_ivf_nprobe_sweep" -> 64L,
    "v12_hybrid_rrf_recall" -> 64L,
    // v13 inherits v04's centroid cross join (constant centroid table)
    "v13_hybrid_bm25_vec" -> 64L,
    // t16: LIMIT-1 merge picks + 1-row scalar aggregates (see scaladoc)
    "t16_bpe_train" -> 1L,
    // t18's encode pass: the same three 1-row merge relations (ORDER
    // BY cnt DESC, pr LIMIT 1 per round) cross-joined into the corpus
    // rewrite — the t16 contract, applied to the encode leg.
    "t18_bpe_encode" -> 1L,
    // v18's recall harness: the 2-row VALUES stage relation (the p08
    // constant-build shape) and the LIMIT-20 query/ground-truth sample
    // cross joins — the v09/v10 sample-by-contract bound.
    "v18_pq_recall" -> 20L,
    // v19's Lloyd assignments cross-join the centroid relation, which
    // carries an ORDER BY/LIMIT identity at every round (seed = a
    // TakeOrdered-8 min-hash pick; each update = ORDER BY cid LIMIT 8
    // over the 8-group stats relation).
    "v19_kmeans_train" -> 8L,
    // t19's per-epoch readout rows: 1-row count x 1-row weight
    // checksum cross joins (the t16 merge-pick bound; Final-mode
    // ungrouped aggregates on both sides).
    "t19_classifier_train" -> 1L,
    // p20's encode leg cross-joins the three 1-row BPE merge
    // relations (t16/t18's machine-checked bound).
    "p20_tokenized_shards" -> 1L,
    // d20's learned-cell assignment is v19's ranking shape: reps
    // cross-join the ORDER BY cid LIMIT 8 centroid relation.
    "d20_semantic_dedup_learned" -> 8L,
    // v22's ground truth: the LIMIT-20 query sample cross-joined with
    // the corpus — the v09/v10 sample-by-contract bound.
    "v22_kmeans_recall" -> 20L,
    // v23's sweep: three LIMIT-K centroid relations (K <= 16), the
    // 3-row VALUES level relation, and the LIMIT-20 ground-truth
    // sample — 20 bounds them all.
    "v23_kmeans_k_sweep" -> 20L,
    // d21's recall harness: the LIMIT-40 doc sample and LIMIT-20
    // vector sample cross joins (ground truth by contract), the
    // VALUES threshold relations, the ORDER BY clabel LIMIT 64 label
    // centroids and the LIMIT-8 learned centroids — 64 bounds all.
    "d21_dedup_recall" -> 64L,
    // v24's grid: v23's bounds (LIMIT-K centroids, LIMIT-20 samples)
    // plus the two 3-row VALUES level relations.
    "v24_kmeans_grid" -> 20L,
    // d22's sweep: the LIMIT-40 doc sample (ground truth by contract)
    // and the 3-row/5-row VALUES geometry/threshold relations.
    "d22_lsh_band_sweep" -> 40L,
    // v25's Pareto surface: v24's bounds exactly (shared pairs pass).
    "v25_kmeans_pareto" -> 20L,
    // v29's policy: v25's bounds exactly (shared pairs pass; the pick
    // is a LIMIT-1 subquery over the 9-row surface).
    "v29_recall_policy" -> 20L,
    // d23's tau sweep: the LIMIT-20 vector sample cross-joined with
    // the corpus (ground truth by contract), the 3-row VALUES tau
    // relations, the ORDER BY clabel LIMIT 64 label centroids and
    // the LIMIT-8 learned centroids — 64 bounds them all (d21's
    // bound, same assignment chains).
    "d23_semdedup_tau_sweep" -> 64L,
    // d24's sweep: the LIMIT-40 signature sample (exact hamming
    // ground truth by contract) and the 3-row/5-row VALUES
    // geometry/threshold relations.
    "d24_simhash_band_sweep" -> 40L,
    // d25's width sweep: three LIMIT-40 per-width doc samples (exact
    // Jaccard-at-k ground truth by contract) and the 3-row VALUES
    // threshold relations.
    "d25_shingle_width_sweep" -> 40L,
    // d26's Pareto surface: d22's bounds exactly (shared gex
    // spelling — LIMIT-40 sample, VALUES geometry/threshold rows).
    "d26_lsh_pareto" -> 40L,
    // d29's collapsed serve: d28's bounds exactly (same gex/pick
    // spelling; the extra collapse joins are equi-joins, the only BNLJ
    // is the 1-row checkpointed pick crossed into the serve).
    "d29_band_policy_collapsed" -> 40L,
    // d28's policy: d26's bounds exactly (shared gex spelling; the
    // pick is a LIMIT-1 subquery over the 3-row surface).
    "d28_band_policy" -> 40L,
    // d27's Pareto surface: d24's bounds exactly (shared sx
    // spelling — LIMIT-40 signature sample, VALUES rows).
    "d27_simhash_pareto" -> 40L,
    // m09's image sweep: the LIMIT-40 band-relation sample (exact
    // hamming ground truth by contract) and the VALUES rows.
    "m09_image_band_sweep" -> 40L,
    // m10's Pareto surface: m09's bounds exactly (shared sx
    // spelling — LIMIT-40 sample, VALUES geometry/threshold rows).
    "m10_image_pareto" -> 40L)

  /** Static upper bound on a physical subtree's row count, derived
    * from shape alone — the machine check behind the BNLJ allowlist
    * (round-13 advice): an allowlist entry alone would also admit a
    * future CORPUS-SIZED build side in the same query; requiring the
    * build side to carry a provable constant bound (LIMIT, ungrouped
    * aggregate, literal VALUES) closes that hole. Filters/projects
    * keep their child's bound; anything unrecognized (e.g. a filtered
    * table scan) is unbounded -> None.
    */
  private def staticBound(p: org.apache.spark.sql.execution.SparkPlan)
      : Option[Long] = {
    import org.apache.spark.sql.execution._
    p match {
      case l: LocalTableScanExec => Some(l.rows.length.toLong)
      case _: OneRowRelationExec => Some(1L)
      case c: columnar.InMemoryTableScanExec =>
        staticBound(c.relation.cachedPlan)
      case t: TakeOrderedAndProjectExec => Some(t.limit.toLong)
      case g: GlobalLimitExec => Some(g.limit.toLong)
      // LocalLimit bounds rows PER PARTITION, not globally — a bare
      // LocalLimit(k) over an n-partition scan is k*n rows, so it
      // proves nothing here (the GlobalLimit above it, when present,
      // is what carries the global bound).
      case l: LocalLimitExec => staticBound(l.child)
      // an ungrouped aggregate is 1 row only in Final/Complete mode;
      // a bare Partial ungrouped aggregate emits one row PER PARTITION
      case a: aggregate.BaseAggregateExec
        if a.groupingExpressions.isEmpty &&
          a.aggregateExpressions.forall(e =>
            e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final ||
            e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Complete) =>
        Some(1L)
      case u: UnionExec =>
        val bs = u.children.map(staticBound)
        if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
      case _: ProjectExec | _: FilterExec | _: SortExec |
           _: exchange.BroadcastExchangeExec |
           _: exchange.ShuffleExchangeExec |
           _: WholeStageCodegenExec | _: InputAdapter |
           _: CoalesceExec =>
        staticBound(p.children.head)
      case r: exchange.ReusedExchangeExec => staticBound(r.child)
      case _ => None
    }
  }

  /** Queries whose plans legitimately contain a window with NO
    * partitionSpec (Spark executes those single-task, so they are a
    * 100 TB scale-killer UNLESS the windowed relation is provably
    * bounded). Exactly one exists in the inventory: p17's cumulative
    * count over its easiness VALUE HISTOGRAM, bounded by the ppm
    * domain (<= 1e6+1 rows at any corpus size); p17's corpus-sized
    * ranks are decomposed onto partitioned windows. The gate exists so
    * a corpus-sized unpartitioned window (like p17's first literal-
    * NTILE draft, which moved the whole corpus to one task) can never
    * land silently.
    */
  private val unpartWindowAllowlist = Set("p17_curriculum_order")

  test("no null-aware anti join, cartesian, unexpected nested loop, or " +
    "unpartitioned corpus window anywhere in the inventory") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val exec = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan
      val naaj = exec.collect {
        case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => b }
      val cart = exec.collect { case c: CartesianProductExec => c }
      val bnlj = exec.collect { case b: BroadcastNestedLoopJoinExec => b }
      val unpartWin = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
        case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty => w }
      if (unpartWin.nonEmpty && !unpartWindowAllowlist.contains(name))
        failures += s"$name: ${unpartWin.size} unpartitioned window(s) — " +
          "single-task at any size; bound the input or partition the spec"
      val badBnlj = bnlj.filter { b =>
        !Set("Inner", "Cross").contains(b.joinType.toString) ||
          (bnljAllowlist.get(name) match {
            case None => true // not allowlisted at all
            case Some(bound) => // allowlisted AND machine-checked
              val build = b.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
                  b.left
                case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
                  b.right
              }
              !staticBound(build).exists(_ <= bound)
          })
      }
      if (naaj.nonEmpty)
        failures += s"$name: ${naaj.size} null-aware anti join(s) — " +
          "broadcast-only at any size"
      if (cart.nonEmpty)
        failures += s"$name: ${cart.size} CartesianProduct(s)"
      if (badBnlj.nonEmpty) {
        val bounds = badBnlj.map { b =>
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          }
          s"${b.joinType}/build<=${staticBound(build).getOrElse("unbounded")}"
        }
        failures += s"$name: BroadcastNestedLoopJoin " +
          s"(${bounds.mkString(",")}) outside the contract-bounded " +
          "allowlist or build side exceeds its machine-checked bound"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("p02's anti-subquery plans as a plain (shuffle-capable) left-anti " +
    "join, not a broadcast-only NAAJ") {
    val exec = graft.SparkEntry
      .queries("p02_pipeline_curate_neardup")(spark, dir)
      .queryExecution.executedPlan
    val antiJoins = exec.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType.toString == "LeftAnti" => j }
    assert(antiJoins.nonEmpty, s"expected a LeftAnti join:\n$exec")
    antiJoins.foreach {
      case b: BroadcastHashJoinExec =>
        // broadcast LeftAnti is fine (size-adaptive: Catalyst flips to a
        // shuffled join when stats exceed the threshold) — but it must
        // not be the null-aware variant, which has no shuffled plan
        assert(!b.isNullAwareAntiJoin,
          s"p02 planned the broadcast-only null-aware anti join:\n$exec")
      case b: BroadcastNestedLoopJoinExec =>
        fail(s"p02 anti join fell back to a nested loop:\n$exec")
      case _ => // shuffled hash / sort-merge LeftAnti: the scale shape
    }
  }
}
