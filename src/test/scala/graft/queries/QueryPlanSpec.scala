package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions for the inventory's scale-critical queries —
  * the claims SCALE.md makes, asserted against the actual physical
  * plans at sf0.001.
  */
class QueryPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("query-plan-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // crisp plan trees
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q26 has no unbounded global window (TakeOrderedAndProject + bounded renumber)") {
    val df = graft.SparkEntry.queries("q26_cf_sort")(spark, dir)
    val exec = df.queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      s"expected top-k sort:\n$exec")
    val windows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "renumbering window expected")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"global (unpartitioned) window in plan:\n$exec"))
  }

  test("q35 is answered without touching data (stats-only scan)") {
    assert(plan("q35_cf_agg_pushdown").contains("stats-only aggregate"))
  }

  test("q38 grouped aggregate is stats-only") {
    assert(plan("q38_cf_agg_group_pushdown").contains("stats-only aggregate"))
  }

  test("q36 joins cf tables with broadcast + runtime filtering") {
    val p = plan("q36_cf_join_runtime")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected runtime filter into the cf scan:\n$p")
  }

  test("v27 pushes the category predicate into the index scan") {
    val p = plan("v27_knn_filtered")
    // the label filter reaches the metadata-carrying index scan's
    // pushed-filter list — candidates are pruned at the reader,
    // underneath the cell-partition pruning the router join drives
    assert(p.contains("EqualTo(label,7)"),
      s"expected the category predicate pushed into the scan:\n$p")
  }

  test("q22 pushes filters into the scan (visible in scan description)") {
    val p = plan("q22_cf_filter_pushdown")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThan"),
      s"expected pushed filters in scan description:\n$p")
  }

  test("p06 per-group cap runs with WindowGroupLimit (map-side top-k)") {
    val p = plan("p06_sample_pergroup_topk")
    assert(p.contains("WindowGroupLimit"),
      s"expected rank<=k pushdown to WindowGroupLimit:\n$p")
  }

  test("t06/p07 per-group top-k runs with WindowGroupLimit; q55 has no nested loop") {
    Seq("t06_tfidf_topterms", "p07_sketch_distinct_kmv").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"),
        s"$q: expected rank<=k pushdown to WindowGroupLimit:\n$p")
    }
    val f = plan("q55_funnel")
    assert(!f.contains("CartesianProduct"),
      s"q55 plans a cartesian product:\n$f")
  }

  test("d03/d05/d06 self-join the cached candidate relation (band build runs once)") {
    // The capped band/gram relation is persisted and self-joined; with a
    // plain CTE each join side would re-run Generate → Exchange → Window
    // over it (round-7 audit's one `weak` plan). The cached build is an
    // InMemoryTableScan leaf, so the pair query's own plan must contain
    // NO Generate/Window at all — those run once, inside the cache.
    Seq("d03_dedup_minhash_lsh", "d05_dedup_simhash_pairs",
      "d06_dedup_ngram_jaccard").foreach { q =>
      val exec = graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan
      val gens = exec.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      val wins = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(gens.isEmpty && wins.isEmpty,
        s"$q: band build not fully materialized — " +
          s"${gens.size} Generate + ${wins.size} Window in pair plan:\n$exec")
      val cacheScans = exec.collect {
        case s if s.nodeName.contains("InMemoryTableScan") => s }
      assert(cacheScans.size >= 2,
        s"$q: expected both self-join sides to read the cache:\n$exec")
    }
  }

  test("v02/d07 self-join the cached capped bucket relation (cap window runs once)") {
    // Same shape as d03/d05/d06: the sign-LSH bucket relation (bucket
    // assignment + hot-bucket cap window) is persisted; the in-bucket
    // self-join must read the cache on both sides. d07's pair plan has
    // no window of its own; v02 keeps exactly one (the per-query top-k
    // ROW_NUMBER) — the cap window must not reappear.
    Seq("d07_dedup_embedding_cosine" -> 0, "v02_knn_sign_lsh" -> 1)
      .foreach { case (q, nWins) =>
        val exec = graft.SparkEntry.queries(q)(spark, dir)
          .queryExecution.executedPlan
        val wins = exec.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w }
        assert(wins.size == nWins,
          s"$q: expected $nWins window(s) in pair plan, " +
            s"got ${wins.size} (cap window re-run?):\n$exec")
        val cacheScans = exec.collect {
          case s if s.nodeName.contains("InMemoryTableScan") => s }
        assert(cacheScans.size >= 2,
          s"$q: expected both self-join sides to read the cache:\n$exec")
      }
  }

  test("d09 rank and member count share one window exchange (no members join)") {
    // The keep-best tail needs two numbers per component — the quality
    // rank and the member count. Both must ride ONE hashpartitioning
    // (comp) exchange (stacked WindowExecs); a separate groupBy-count +
    // join would re-shuffle and re-join the same relation.
    val exec = graft.SparkEntry.queries("d09_dedup_cc_keep_best")(spark, dir)
      .queryExecution.executedPlan
    val wins = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.size == 2,
      s"d09: expected stacked rank+count windows, got ${wins.size}:\n$exec")
    // walk from the outer window down to the inner one: the segment
    // between them must contain no shuffle (they share the exchange)
    var cur = wins.head.child
    var sawExchange = false
    while (!cur.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) {
      if (cur.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
        sawExchange = true
      cur = cur.children.head
    }
    assert(!sawExchange,
      s"d09: exchange between the stacked windows:\n$exec")
  }

  test("q57 pushes struct-leaf filters into the cf scan") {
    val p = plan("q57_cf_nested_filter")
    assert(p.contains("PushedFilters: [") && p.contains("info.status") &&
      p.contains("info.dates.y"),
      s"expected nested-leaf filters in scan description:\n$p")
  }

  test("q51/q53 operator joins plan as equi-joins, no nested loop") {
    Seq("q51_range_join", "q53_salted_join").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), s"$q plans a nested loop:\n$p")
    }
  }

  test("d15 consumers read the cached array scan; no pair stage anywhere") {
    // The array-valued positional scan is cached (d13's lesson: denser
    // than row-per-position); the dup index and the semi-join each
    // re-explode it (exactly two live Generates, both over the cache),
    // the doc base reads it explode-free. The operator's core claim:
    // no join wider than the hash semi-join — no nested loop, no
    // cartesian; candidate-free by construction.
    val exec = graft.SparkEntry.queries("d15_dup_span_longest")(spark, dir)
      .queryExecution.executedPlan
    val p = exec.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"d15 plans a nested loop:\n$p")
    val gens = exec.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(gens.size <= 2,
      s"d15: more explodes than the two cache consumers:\n$p")
    val cacheScans = exec.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s }
    assert(cacheScans.size >= 3,
      s"d15: dup index, semi-join, and doc base should all read the " +
        s"cached array scan:\n$p")
  }

  test("d16 pair stage is an equi-join over the cached assignment") {
    // The centroid cross product lives inside the cached assign build;
    // the LIVE pair query must be equi-joins only (clabel + vec_id),
    // reading the assign/emb caches on every side. Node COLLECTION, not
    // string matching: InMemoryRelation prints its one-time build plan
    // (which legitimately contains the tiny centroid cartesian), so a
    // string check can't tell a cached build from a live re-execution —
    // and the live re-execution is exactly the regression this guards
    // (a view-based formulation re-ran the whole centroid pipeline,
    // cartesian + window, once per query).
    val exec = graft.SparkEntry.queries("d16_semantic_dedup")(spark, dir)
      .queryExecution.executedPlan
    val cart = exec.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c }
    val wins = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(cart.isEmpty && wins.isEmpty,
      s"d16 re-executes the centroid pipeline outside the cache:\n$exec")
    val cacheScans = exec.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s }
    assert(cacheScans.size >= 4,
      s"d16: pair sides and scoring sides should read caches:\n$exec")
  }

  test("t06/t07 tokenize once: no live Generate outside the cache") {
    // t06 caches the (doc, term, tf) relation (aggregated below the
    // explode — compact); t07 caches the term-FILTERED postings plus an
    // explode-free array-size length relation. In both, every consumer
    // reads a cache and the corpus is tokenized exactly once, where the
    // CTE forms re-ran the explode per consumer (2-3 live GenerateExecs).
    // d13 is deliberately NOT here: its re-used relation cannot
    // aggregate below the explode, and caching the exploded rows
    // measured SLOWER than re-exploding the cached arrays (see the
    // dupCoverage scaladoc) — its contract is cache >= 2 instead.
    Seq("t06_tfidf_topterms", "t07_bm25_search").foreach { q =>
      val exec = graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan
      val gens = exec.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      assert(gens.isEmpty,
        s"$q re-runs the tokenize explode outside the cache:\n$exec")
      val cacheScans = exec.collect {
        case s if s.nodeName.contains("InMemoryTableScan") => s }
      assert(cacheScans.size >= 2,
        s"$q: consumers should read the cached token relation:\n$exec")
    }
    val d13 = graft.SparkEntry.queries("d13_dup_shingle_coverage")(spark, dir)
      .queryExecution.executedPlan
    val d13Scans = d13.collect {
      case s if s.nodeName.contains("InMemoryTableScan") => s }
    assert(d13Scans.size >= 2,
      s"d13: both consumers should read the cached array scan:\n$d13")
  }

  test("t11 classifier is a pure scan (no join anywhere in the plan)") {
    val exec = graft.SparkEntry.queries("t11_quality_classifier")(spark, dir)
      .queryExecution.executedPlan
    val joins = exec.collect {
      case j if j.nodeName.contains("Join") => j }
    assert(joins.isEmpty, s"t11 should be join-free:\n$exec")
  }

  test("p11 sketch has no product joins; register rollup aggregates") {
    val p = plan("p11_sketch_distinct_hll")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"p11 plans a product:\n$p")
    assert(p.contains("HashAggregate"), s"p11 register rollup missing:\n$p")
  }

  test("v05 probe scan reads only the probed cells' directories") {
    import org.apache.spark.sql.functions.col
    val idxPath = ExtQueries.ivfIndexPath(spark, dir)
    val allCells = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(allCells.length == 10, s"expected 10 cell dirs: ${allCells.toSeq}")

    // the cells the scan ACTUALLY read: pruning now happens via runtime
    // filtering (the broadcast router relation → In-filter → directory
    // prune at execution), so inspect the executed scan's RDD partitions
    // AFTER running the query, not the static planInputPartitions.
    def executedCells(d: org.apache.spark.sql.DataFrame): Set[String] = {
      d.collect()
      val scans = d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val idxScans = scans.filter(_.output.exists(_.name == "cell"))
      assert(idxScans.nonEmpty, "index scan not found in plan")
      idxScans.flatMap(_.inputRDD.partitions).flatMap {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions
      }.flatMap {
        case p: graft.spark.CfPartition => p.partitionValues.toSeq
      }.toSet
    }
    // expected probe cells, computed by the spec (the collect lives HERE,
    // not in the query path)
    def probes(maxQid: Long): Seq[(Long, Int)] =
      spark.sql(ExtQueries.ivfProbesSql(maxQid)).collect().toSeq
        .map(r => (r.getLong(0), r.getAs[Number]("pcell").intValue))
    // the composed 20-query batch: executed dirs == union of probed cells
    // (at this tiny sf the 20 queries' probes happen to cover all 10
    // cells — the single-query case below shows the strict pruning)
    val df = graft.SparkEntry.queries("v05_knn_ivf_indexed")(spark, dir)
    val probed = probes(20L).map(_._2.toString).toSet
    val executed = executedCells(df)
    assert(executed == probed,
      s"executed $executed, probed $probed of ${allCells.length} dirs")
    // a single query vector: exactly nprobe=2 of the 10 directories —
    // asserted through the SAME runtime-filter path the query uses (the
    // materialized router table, range-filtered, broadcast to the join;
    // no isin literals anywhere)
    val one = probes(1L).map(_._2)
    assert(one.length == 2)
    val routerPath = ExtQueries.ivfRouterPath(spark, dir)
    spark.read.format("columnfile").option("runtimeFiltering", "false")
      .load(routerPath).where("qid < 1").createOrReplaceTempView("ivf_probe1")
    spark.read.format("columnfile").load(idxPath)
      .createOrReplaceTempView("ivf_idx_plan")
    val oneScan = spark.sql(
      """SELECT /*+ BROADCAST(p) */ n.vec_id, n.cell
        |FROM ivf_probe1 p JOIN ivf_idx_plan n ON n.cell = p.pcell""".stripMargin)
    assert(executedCells(oneScan) == one.map(_.toString).toSet)
  }

  test("p20 shards land partitioned by (split, lang); the pack window " +
    "is keyed (split, lang, shard); no exchange between window and sink") {
    // run the capstone (builds the shards on first touch)
    graft.SparkEntry.queries("p20_tokenized_shards")(spark, dir).collect()
    val out = Tables.cachePath(dir, "p20_shards")
    val splitDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(splitDirs.nonEmpty &&
      splitDirs.toSet.subsetOf(Set("split=train", "split=val", "split=test")),
      s"unexpected layout: ${splitDirs.toSeq}")
    val langDirs = splitDirs.flatMap(s =>
      new java.io.File(out, s).listFiles().filter(_.isDirectory).map(_.getName))
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")),
      s"unexpected lang layout: ${langDirs.toSeq}")
    // the pre-write relation: every window partitioned by the full
    // (split, lang, shard) pack key, and the plan ABOVE the pack
    // window (what the sink consumes) contains no further exchange —
    // the write itself requests no distribution, so each task streams
    // its window partitions straight into the partition directories.
    val rel = ExtQueries.TestSql.p20ShardRelation(spark)
    val exec = rel.queryExecution.executedPlan
    val wins = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty, s"expected the pack window:\n$exec")
    wins.foreach { w =>
      assert(w.partitionSpec.size == 3,
        s"pack window must be keyed (split, lang, shard):\n$w")
    }
    def above(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p match {
        case w: org.apache.spark.sql.execution.window.WindowExec => false
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          true
        case other => other.children.exists(above)
      }
    assert(!above(exec),
      s"exchange between the pack window and the sink:\n$exec")
  }

  test("v20 learned-index probe scan reads only the probed learned " +
    "cells' directories") {
    val idxPath = ExtQueries.kmeansIndexPath(spark, dir)
    val routerPath = ExtQueries.kmeansRouterPath(spark, dir)
    val allCells = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(allCells.length <= 8 && allCells.length >= 2,
      s"expected 2..8 learned cell dirs: ${allCells.toSeq}")
    def executedCells(d: org.apache.spark.sql.DataFrame): Set[String] = {
      d.collect()
      val scans = d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val idxScans = scans.filter(_.output.exists(_.name == "cell"))
      assert(idxScans.nonEmpty, "learned index scan not found in plan")
      idxScans.flatMap(_.inputRDD.partitions).flatMap {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions
      }.flatMap {
        case p: graft.spark.CfPartition => p.partitionValues.toSeq
      }.toSet
    }
    def routerCells(maxQid: Long): Set[String] =
      spark.read.format("columnfile").load(routerPath)
        .where(s"qid < $maxQid").collect()
        .map(_.getAs[Number]("pcell").longValue.toString).toSet
    // the 20-query batch: executed dirs == union of the router's cells
    val df = graft.SparkEntry.queries("v20_knn_kmeans_indexed")(spark, dir)
    assert(executedCells(df) == routerCells(20L))
    // a single query: exactly nprobe=2 of the learned directories,
    // through the same runtime-filter path the query uses
    val one = routerCells(1L)
    assert(one.size == 2, s"one-query probes: $one")
    spark.read.format("columnfile").option("runtimeFiltering", "false")
      .load(routerPath).where("qid < 1")
      .createOrReplaceTempView("km_probe1")
    spark.read.format("columnfile").load(idxPath)
      .createOrReplaceTempView("km_idx_plan")
    val oneScan = spark.sql(
      """SELECT /*+ BROADCAST(p) */ n.vec_id, n.cell
        |FROM km_probe1 p JOIN km_idx_plan n ON n.cell = p.pcell""".stripMargin)
    assert(executedCells(oneScan) == one)
  }

  test("v17 code scan prunes to one query's probed cells; the probe " +
    "never scans corpus embeddings") {
    // The IVFPQ probe rides the SAME runtime-filter path as v05 (the
    // broadcast router → In-filter → directory prune), but over the
    // CODE table — 4 small ints per vector, not the 256 B embedding.
    Tables.registerAll(spark, dir) // graft_* functions for ivfProbesSql
    val codesPath = ExtQueries.pqCodesPath(spark, dir)
    val allCells = new java.io.File(codesPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(allCells.length == 10, s"expected 10 cell dirs: ${allCells.toSeq}")
    def executedCells(d: org.apache.spark.sql.DataFrame): Set[String] = {
      d.collect()
      val scans = d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val idxScans = scans.filter(s => s.output.exists(_.name == "cell") &&
        s.output.exists(_.name == "code"))
      assert(idxScans.nonEmpty, "code-table scan not found in plan")
      idxScans.flatMap(_.inputRDD.partitions).flatMap {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions
      }.flatMap {
        case p: graft.spark.CfPartition => p.partitionValues.toSeq
      }.toSet
    }
    val one = spark.sql(ExtQueries.ivfProbesSql(1L)).collect().toSeq
      .map(_.getAs[Number]("pcell").intValue)
    assert(one.length == 2)
    val routerPath = ExtQueries.ivfRouterPath(spark, dir)
    spark.read.format("columnfile").option("runtimeFiltering", "false")
      .load(routerPath).where("qid < 1").createOrReplaceTempView("pq_probe1")
    spark.read.format("columnfile").load(codesPath)
      .createOrReplaceTempView("pq_codes_plan")
    val oneScan = spark.sql(
      """SELECT /*+ BROADCAST(p) */ k.vec_id, k.cell, k.code
        |FROM pq_probe1 p JOIN pq_codes_plan k ON k.cell = p.pcell""".stripMargin)
    assert(executedCells(oneScan) == one.map(_.toString).toSet,
      s"executed ${executedCells(oneScan)}, probed $one")
    // and in the full v17 plan the ADC aggregate is fed by the CODE
    // table (4 small ints per candidate), never by a corpus-embedding
    // scan: the only embeddings leaves under it are the vec_id < 20
    // query-vector scan behind the distance table
    val v17 = graft.SparkEntry.queries("v17_knn_ivfpq")(spark, dir)
    v17.collect()
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val adcAggs = v17.queryExecution.executedPlan.collect {
      case a: HashAggregateExec
          if a.groupingExpressions.map(_.name).toSet == Set("qid", "vec_id") => a
    }
    assert(adcAggs.nonEmpty, "ADC aggregate not found")
    adcAggs.foreach { a =>
      val leafCols = a.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.output.map(_.name).toSet
      }
      assert(leafCols.exists(_.contains("code")),
        s"ADC aggregate not fed by the code table: $leafCols")
      leafCols.filter(_.contains("embedding")).foreach { cols =>
        // an embeddings leaf is only acceptable as the bounded
        // query-vector scan (its scan prints the pushed vec_id range)
        val scans = a.collectLeaves().collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
              if b.output.map(_.name).toSet == cols => b.toString
        }
        assert(scans.forall(_.contains("vec_id")),
          s"unbounded corpus embedding scan under the ADC aggregate")
      }
    }
  }

  test("v21 learned-IVFPQ code scan prunes to the probed LEARNED cells; " +
    "the ADC aggregate is fed by codes, never a corpus-embedding scan") {
    Tables.registerAll(spark, dir)
    val codesPath = ExtQueries.kmPqCodesPath(spark, dir)
    val routerPath = ExtQueries.kmeansRouterPath(spark, dir)
    val allCells = new java.io.File(codesPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell=")).map(_.getName)
    assert(allCells.length <= 8 && allCells.length >= 2,
      s"expected 2..8 learned cell dirs: ${allCells.toSeq}")
    def executedCells(d: org.apache.spark.sql.DataFrame): Set[String] = {
      d.collect()
      val scans = d.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      val idxScans = scans.filter(s => s.output.exists(_.name == "cell") &&
        s.output.exists(_.name == "code"))
      assert(idxScans.nonEmpty, "learned code-table scan not found in plan")
      idxScans.flatMap(_.inputRDD.partitions).flatMap {
        case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          p.inputPartitions
      }.flatMap {
        case p: graft.spark.CfPartition => p.partitionValues.toSeq
      }.toSet
    }
    // single query: exactly its nprobe=2 learned cells, via the same
    // broadcast-router runtime-filter path the query uses
    val one = spark.read.format("columnfile").load(routerPath)
      .where("qid < 1").collect()
      .map(_.getAs[Number]("pcell").longValue.toString).toSet
    assert(one.size == 2, s"one-query probes: $one")
    spark.read.format("columnfile").option("runtimeFiltering", "false")
      .load(routerPath).where("qid < 1").createOrReplaceTempView("kmpq_probe1")
    spark.read.format("columnfile").load(codesPath)
      .createOrReplaceTempView("kmpq_codes_plan")
    val oneScan = spark.sql(
      """SELECT /*+ BROADCAST(p) */ k.vec_id, k.cell, k.code
        |FROM kmpq_probe1 p JOIN kmpq_codes_plan k ON k.cell = p.pcell""".stripMargin)
    assert(executedCells(oneScan) == one,
      s"executed ${executedCells(oneScan)}, probed $one")
    // full v21 plan: the ADC aggregate reads the learned code table;
    // any embeddings leaf under it is the bounded query-vector scan
    val v21 = graft.SparkEntry.queries("v21_knn_ivfpq_learned")(spark, dir)
    v21.collect()
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val adcAggs = v21.queryExecution.executedPlan.collect {
      case a: HashAggregateExec
          if a.groupingExpressions.map(_.name).toSet == Set("qid", "vec_id") => a
    }
    assert(adcAggs.nonEmpty, "ADC aggregate not found")
    adcAggs.foreach { a =>
      val leafCols = a.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.output.map(_.name).toSet
      }
      assert(leafCols.exists(_.contains("code")),
        s"ADC aggregate not fed by the learned code table: $leafCols")
      leafCols.filter(_.contains("embedding")).foreach { cols =>
        val scans = a.collectLeaves().collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
              if b.output.map(_.name).toSet == cols => b.toString
        }
        assert(scans.forall(_.contains("vec_id")),
          s"unbounded corpus embedding scan under the ADC aggregate")
      }
    }
  }

  test("t17 probe scan reads only the probed term-bucket directories") {
    val idxPath = ExtQueries.invIndexPath(spark, dir)
    val allTb = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("tb=")).map(_.getName)
    assert(allTb.length >= 10, s"expected many tb dirs: ${allTb.length}")
    // the buckets the three literal terms constant-fold to
    val expected = spark.sql(
      "SELECT CAST(pmod(graft_polyhash('hash'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('join'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('vector'), 64) AS INT)")
      .first().toSeq.map(_.toString).toSet
    assert(expected.size <= 3 && allTb.length > expected.size)
    // the same probe shape t17 builds (uncached so the scan executes
    // here); the tb IN (...) filter must fold to literals and prune
    val probe = spark.read.format("columnfile").load(idxPath)
      .where("w IN ('hash', 'join', 'vector') AND tb IN (" +
        "CAST(pmod(graft_polyhash('hash'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('join'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('vector'), 64) AS INT))")
    probe.collect()
    val read = probe.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputRDD.partitions).flatMap {
      case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
        p.inputPartitions
    }.flatMap {
      case p: graft.spark.CfPartition => p.partitionValues.toSeq.map(_.toString)
    }.toSet
    assert(read == expected,
      s"probe read dirs $read, expected $expected of ${allTb.length}")
  }

  test("q67 compacted probe reads only the probed term-bucket dirs " +
    "(the former delta is inside the prune)") {
    Tables.registerAll(spark, dir)
    // run once: builds base+delta (q66) and the compacted table
    graft.SparkEntry.queries("q67_index_compact")(spark, dir).collect()
    val idxPath = Tables.cachePath(dir, "inv_compacted")
    val allTb = new java.io.File(idxPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("tb=")).map(_.getName)
    assert(allTb.length >= 10, s"expected many tb dirs: ${allTb.length}")
    val expected = spark.sql(
      "SELECT CAST(pmod(graft_polyhash('hash'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('join'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('vector'), 64) AS INT)")
      .first().toSeq.map(_.toString).toSet
    val probe = spark.read.format("columnfile").load(idxPath)
      .where("w IN ('hash', 'join', 'vector') AND tb IN (" +
        "CAST(pmod(graft_polyhash('hash'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('join'), 64) AS INT), " +
        "CAST(pmod(graft_polyhash('vector'), 64) AS INT))")
    probe.collect()
    val read = probe.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.flatMap(_.inputRDD.partitions).flatMap {
      case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
        p.inputPartitions
    }.flatMap {
      case p: graft.spark.CfPartition => p.partitionValues.toSeq.map(_.toString)
    }.toSet
    assert(read == expected,
      s"probe read dirs $read, expected $expected of ${allTb.length}")
  }

  test("v15's index-served inputs hash-equal the from-raw-text " +
    "recompute (the retired v14's parity claim, as a direct assertion)") {
    // v14_hybrid_indexed was retired in r15 (dominated by v15 on the
    // same index; its aggregate stage was v13's documented blowup).
    // Its one unique piece of evidence — serving retrieval inputs from
    // the materialized index surfaces loses NOTHING vs recomputing
    // them from raw text — is asserted here directly on the relations
    // v15 consumes.
    // Recomputed-from-raw-text side: v13's own input views.
    Tables.registerAll(spark, dir)
    ExtQueries.TestSql.hybridBm25Vec(spark).collect()
    val rawTfq = spark.table("v13_tfq")
      .selectExpr("doc_id", "w", "tf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val rawDl = spark.table("v13_dl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // Index-served side: exactly v15's input relations.
    spark.read.format("columnfile")
      .load(ExtQueries.invQtPath(spark, dir))
      .where("qid < 20").createOrReplaceTempView("par_qt")
    spark.read.format("columnfile")
      .load(ExtQueries.invIndexPath(spark, dir))
      .createOrReplaceTempView("par_post")
    val servedTfq = spark.sql(
      """SELECT p.doc_id, p.w, p.tf FROM par_post p
        |LEFT SEMI JOIN par_qt q ON p.tb = q.tb AND p.w = q.w""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val servedDl = spark.read.format("columnfile")
      .load(ExtQueries.invDlPath(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rawTfq.nonEmpty && rawDl.nonEmpty)
    assert(servedTfq.toSeq == rawTfq.toSeq,
      s"index-served postings diverge: ${servedTfq.length} vs ${rawTfq.length}")
    assert(servedDl.toSeq == rawDl.toSeq,
      s"index-served doc lengths diverge: ${servedDl.length} vs ${rawDl.length}")
  }

  test("t17 and v15 never touch raw text (no tokenize in any plan or " +
    "cache build)") {
    // The index queries' whole point: the corpus tokenize (a Generate
    // over documents.text) happens ONCE at index build, never at query
    // time. Typed check for live Generates plus a conservative string
    // check that no documents scan appears anywhere — including inside
    // InMemoryRelation build plans (printed inline), so a cached
    // tokenize can't hide. (v14 was retired in r15; v15 carries the
    // index-served surface.)
    for (name <- Seq("t17_bm25_indexed",
        "v15_hybrid_dense")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val exec = df.queryExecution.executedPlan
      // v15's one permitted Generate is the 20-way stack that unpivots
      // the per-doc missing-mass columns — a width-20 constant fan-out,
      // not a corpus tokenize (those are explode-over-split).
      val gens = exec.collect {
        case g: org.apache.spark.sql.execution.GenerateExec
            if !g.boundGenerator.isInstanceOf[
              org.apache.spark.sql.catalyst.expressions.Stack] => g }
      assert(gens.isEmpty, s"$name has a live tokenize Generate:\n$exec")
      assert(!exec.toString.contains("documents.parquet"),
        s"$name reads raw documents:\n$exec")
    }
  }

  test("p21 consumes the STORED token arrays: no raw-text tokenize, no " +
    "documents scan, pair counts shuffle once") {
    // The consumer's whole point: the loader-side stats pass reads the
    // shard artifact, never the corpus. The only Generate is the
    // explode of the map-side bigram array OVER THE STORED toks
    // column; no explode-over-split(text), no documents scan anywhere
    // (including cached build plans, printed inline).
    val df = graft.SparkEntry.queries("p21_shard_bigrams")(spark, dir)
    df.collect()
    val exec = df.queryExecution.executedPlan
    assert(!exec.toString.contains("documents.parquet"),
      s"p21 reads raw documents:\n$exec")
    assert(!exec.toString.toLowerCase.contains("split(lower(text)"),
      s"p21 re-tokenizes raw text:\n$exec")
    val scans = exec.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty &&
      scans.forall(_.output.exists(n => Set("toks", "btoks", "doc_id")
        .contains(n.name))),
      s"p21 must scan only the shard table: ${scans.map(_.output)}")
    // the arrays reach the plan: some scan carries the toks column
    assert(scans.exists(_.output.exists(_.name == "toks")),
      s"stored token arrays not read:\n$exec")
  }

  test("p22 readout serves base ∪ delta from SHARD scans only; p23's " +
    "compacted readout never touches text or the tokenizer") {
    // The maintenance story's plan claim: after build, the consumer
    // pass reads the shard artifact (base table + delta batch dirs) —
    // no documents scan, no re-tokenize; and the windows (pack/top-3)
    // are always partitioned.
    for (name <- Seq("p22_shard_maintain", "p23_shard_compact")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val exec = df.queryExecution.executedPlan
      assert(!exec.toString.contains("documents.parquet"),
        s"$name readout reads raw documents:\n$exec")
      assert(!exec.toString.toLowerCase.contains("split(lower(text)"),
        s"$name readout re-tokenizes raw text:\n$exec")
      val windows = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$name has an unpartitioned window:\n$exec"))
      val scans = exec.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b }
      assert(scans.nonEmpty && scans.forall(_.output.exists(n =>
        Set("toks", "btoks", "doc_id").contains(n.name))),
        s"$name must scan only shard tables: ${scans.map(_.output)}")
    }
  }

  test("v15 scores all 20 queries in one doc-keyed pass (no per-query " +
    "posting blowup)") {
    // The point of the document-at-a-time rewrite: the ONLY join that
    // touches the postings fact on both plan legs is the build-side
    // hash of bounded relations (df / doc-length / query-mask); the
    // per-(query, term, doc) equi join of v13/v14 — qt joined to the
    // postings on the term key, fanning every common-term posting out
    // once per query — must not exist. Checked structurally: no
    // shuffle/broadcast join in the executed plan has BOTH children
    // containing a columnfile batch scan of the postings index AND a
    // scan of the query-token router on the term join key; and the
    // whole plan carries exactly one aggregate keyed by doc_id alone
    // (the 21-column vector aggregate), not one keyed by (qid, doc).
    val df = graft.SparkEntry.queries("v15_hybrid_dense")(spark, dir)
    df.collect()
    val exec = df.queryExecution.executedPlan
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val aggKeys = exec.collect { case a: HashAggregateExec =>
      a.groupingExpressions.map(_.name).toSet }
    assert(!aggKeys.exists(k => k.contains("qid") && k.exists(_.startsWith("doc"))),
      s"v15 still aggregates per (qid, doc): $aggKeys")
    assert(aggKeys.count(_ == Set("doc_id")) >= 2, // partial + final
      s"expected the doc-keyed vector aggregate: $aggKeys")
  }

  test("q21 prunes the read schema to the projected columns") {
    val p = plan("q21_cf_projection")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>") ||
      (p.contains("l_orderkey") && !p.contains("l_comment")),
      s"expected pruned ReadSchema:\n$p")
  }
}
