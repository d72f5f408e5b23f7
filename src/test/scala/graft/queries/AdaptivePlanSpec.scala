package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions WITH AQE ON (VERDICT r9 #6).
  *
  * QueryPlanSpec pins the load-bearing shapes with
  * `spark.sql.adaptive.enabled=false` for crisp trees; the bench and the
  * driver's verify run with AQE defaults, where plans are re-optimized
  * per stage at runtime. These cases re-assert the same claims against
  * the FINAL adaptive plan (after execution), so an AQE re-plan that
  * quietly drops a WindowGroupLimit, re-introduces a shuffle into the
  * storage-partitioned join, or degrades the runtime filter to
  * `dynamicpruningexpression(true)` fails a test instead of only
  * showing up as a bench regression.
  */
class AdaptivePlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("adaptive-plan-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true") // the bench's reality
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Execute and return the FINAL adaptive plan (post re-optimization). */
  private def finalPlan(name: String): SparkPlan = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** AQE-aware children: descend into materialized query stages and
    * reused/adaptive wrappers, which are leaves to the stock traversal.
    */
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case other => other.children
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: kids(p).flatMap(flatten)

  test("p06/t06/p07/v08 keep WindowGroupLimit under AQE re-planning") {
    Seq("p06_sample_pergroup_topk", "t06_tfidf_topterms",
        "p07_sketch_distinct_kmv", "v08_knn_rerank").foreach { q =>
      val nodes = flatten(finalPlan(q))
      assert(nodes.exists(_.nodeName.contains("WindowGroupLimit")),
        s"$q: WindowGroupLimit lost under AQE:\n" +
          nodes.map(_.nodeName).mkString(", "))
    }
  }

  test("v15 keeps the doc-at-a-time shape under AQE (no (qid, doc) " +
    "aggregate reappears)") {
    // The round-14 rewrite's invariant, re-asserted against the FINAL
    // adaptive plan: the per-query scoring must stay ONE doc_id-keyed
    // vector aggregate; an AQE re-plan that resurrected a
    // (qid, doc)-keyed aggregate would reintroduce the 190M-row
    // blowup the rewrite exists to remove.
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val nodes = flatten(finalPlan("v15_hybrid_dense"))
    val aggKeys = nodes.collect { case a: HashAggregateExec =>
      a.groupingExpressions.map(_.name).toSet }
    assert(!aggKeys.exists(k => k.contains("qid") &&
        k.exists(_.startsWith("doc"))),
      s"v15 re-planned into a per-(qid, doc) aggregate: $aggKeys")
    assert(aggKeys.count(_ == Set("doc_id")) >= 2,
      s"doc-keyed vector aggregate missing under AQE: $aggKeys")
  }

  test("q37 storage-partitioned join stays exchange-free under AQE") {
    val nodes = flatten(finalPlan("q37_cf_spj_join"))
    val shuffles = nodes.filter(n => n.isInstanceOf[ShuffleExchangeExec] ||
      n.nodeName.contains("ShuffleQueryStage"))
    assert(shuffles.isEmpty,
      s"q37: AQE re-introduced ${shuffles.size} shuffle(s): " +
        nodes.map(_.nodeName).mkString(", "))
  }

  test("q36 keeps a live fact-side runtime filter under AQE (never degraded to true)") {
    val df = graft.SparkEntry.queries("q36_cf_join_runtime")(spark, dir)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.toLowerCase.contains("dynamicpruning"),
      s"q36: runtime filter missing under AQE:\n$s")
    assert(!s.contains("dynamicpruningexpression(true)"),
      s"q36: a DPP degraded to literal true (broadcast reuse fell through " +
        s"— check dimension runtimeFiltering opt-outs):\n$s")
  }

  test("d09 stacked rank+count windows share one exchange under AQE") {
    val nodes = flatten(finalPlan("d09_dedup_cc_keep_best"))
    val wins = nodes.collect { case w: WindowExec => w }
    assert(wins.size == 2,
      s"d09: expected stacked rank+count windows, got ${wins.size}: " +
        nodes.map(_.nodeName).mkString(", "))
    // identify outer = the window whose subtree contains the other, then
    // assert the path between them crosses no shuffle (stage boundary,
    // exchange, or AQE shuffle read)
    val (outer, inner) =
      if (flatten(wins(0)).exists(_ eq wins(1))) (wins(0), wins(1))
      else (wins(1), wins(0))
    assert(flatten(outer).exists(_ eq inner),
      "d09: windows are not stacked (neither contains the other)")
    def pathCrossesShuffle(from: SparkPlan): Option[Boolean] = {
      if (from eq inner) return Some(false)
      val isShuffle = from.isInstanceOf[ShuffleExchangeExec] ||
        from.isInstanceOf[AQEShuffleReadExec] ||
        from.nodeName.contains("ShuffleQueryStage")
      kids(from).flatMap(pathCrossesShuffle).headOption.map(_ || isShuffle)
    }
    val crossed = kids(outer).flatMap(pathCrossesShuffle).headOption
    assert(crossed.contains(false),
      s"d09: shuffle between the stacked windows under AQE: " +
        nodes.map(_.nodeName).mkString(", "))
  }

  test("m04/m05 image decode seam runs once under AQE (cached, never live)") {
    // The d16 failure class: a cached relation referenced 3+ times from
    // one SQL statement can silently lose cache substitution, here
    // re-running the mapPartitions PGM decode per reference. flatten()
    // does not descend into InMemoryTableScan children, so any LIVE
    // MapPartitions node means the seam re-executed.
    Seq("m04_image_dhash_dedup" -> 3, "m05_image_dhash_collapsed" -> 3,
      "m06_image_bmp_dedup" -> 3, "p15_multimodal_curate" -> 3,
      "p16_multimodal_curate_av" -> 5)
      .foreach { case (q, minCacheScans) =>
        val nodes = flatten(finalPlan(q))
        val liveDecode = nodes.filter(_.nodeName.contains("MapPartitions"))
        assert(liveDecode.isEmpty,
          s"$q: decode seam re-executed live under AQE: " +
            nodes.map(_.nodeName).mkString(", "))
        val cacheScans = nodes.count(_.nodeName.contains("InMemoryTableScan"))
        assert(cacheScans >= minCacheScans,
          s"$q: expected >= $minCacheScans cache scans, got $cacheScans")
      }
  }
}
