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
    * BroadcastNestedLoopJoin over a CONSTANT-size build side (by
    * contract): the 3-row VALUES probe relation (p08/q61), the
    * query-vector / centroid constant relations (v01/v03/v04/v07/v08),
    * the 1-row `nb` sizing relation (v06), the bounded query-sample
    * ground-truth stages of the recall harnesses (v09/v10), p18's
    * 3-row probe-index relation fanned over each split (the p08 shape),
    * and t16's BPE training rounds: each round CROSS JOINs the
    * vocabulary relation against `m$r` (a LIMIT-1 TakeOrdered top merge
    * pick) and the readout against `a$r` (a scalar aggregate) — both
    * 1-row BY CONTRACT (LIMIT 1 / ungrouped aggregate), so the BNLJ
    * build side is a single row at any corpus size (adjudicated round
    * 13; the p08 precedent).
    */
  private val bnljAllowlist = Set(
    "p08_sketch_heavy_hitters", "q61_stream_cms_sketch",
    "p18_bloom_membership",
    "v01_knn_brute", "v03_knn_ivf_assign", "v04_knn_ivf_search",
    "v06_ann_cap_report", "v07_knn_quantized", "v08_knn_rerank",
    "v09_ann_recall", "v10_ivf_recall", "v11_ivf_nprobe_sweep",
    "v12_hybrid_rrf_recall",
    // v13 inherits v04's centroid cross join (constant centroid table)
    "v13_hybrid_bm25_vec",
    // t16: LIMIT-1 merge picks + 1-row scalar aggregates (see scaladoc)
    "t16_bpe_train")

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
      val badBnlj = bnlj.filter(b =>
        !Set("Inner", "Cross").contains(b.joinType.toString) ||
          !bnljAllowlist.contains(name))
      if (naaj.nonEmpty)
        failures += s"$name: ${naaj.size} null-aware anti join(s) — " +
          "broadcast-only at any size"
      if (cart.nonEmpty)
        failures += s"$name: ${cart.size} CartesianProduct(s)"
      if (badBnlj.nonEmpty)
        failures += s"$name: BroadcastNestedLoopJoin " +
          s"(${badBnlj.map(_.joinType).mkString(",")}) outside the " +
          "contract-bounded allowlist"
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
