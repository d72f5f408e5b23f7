package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins: two columnfile tables Hive-partitioned on
  * the join column report KeyGroupedPartitioning with per-split keys, so
  * Spark joins them without any shuffle exchange.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("spj-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("join on the partition column runs with zero shuffle exchanges") {
    val sp = spark; import sp.implicits._
    val dirA = Files.createTempDirectory("cf-spj-a").toString
    val dirB = Files.createTempDirectory("cf-spj-b").toString
    (0 until 3000).map(i => (i.toLong, s"g${i % 8}", i * 2.0))
      .toDF("id", "g", "x")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirA)
    (0 until 800).map(i => (i.toLong, s"g${i % 8}", s"n$i"))
      .toDF("bid", "g", "name")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirB)

    val a = spark.read.format("columnfile").load(dirA)
    val b = spark.read.format("columnfile").load(dirB)
    val joined = a.join(b, "g")
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sx"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinPart = plan.linesIterator.takeWhile(!_.contains("HashAggregate")).mkString("\n")
    // the join itself must consume the scans directly: no Exchange between
    // the sorts/join and the two BatchScans
    val exchangesBelowAgg = plan.linesIterator
      .dropWhile(l => !l.contains("SortMergeJoin"))
      .count(_.contains("Exchange"))
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(exchangesBelowAgg == 0,
      s"expected shuffle-free storage-partitioned join:\n$plan")

    // correctness vs the same join over parquet
    val pa = (0 until 3000).map(i => (i.toLong, s"g${i % 8}", i * 2.0))
      .toDF("id", "g", "x")
    val pb = (0 until 800).map(i => (i.toLong, s"g${i % 8}", s"n$i"))
      .toDF("bid", "g", "name")
    val expect = pa.join(pb, "g").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum("x").as("sx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val got = joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == expect.toSeq)
  }

  test("storage-partitioned join stays exchange-free with AQE enabled") {
    val sp = spark; import sp.implicits._
    val dirA = Files.createTempDirectory("cf-spj-aqe-a").toString
    val dirB = Files.createTempDirectory("cf-spj-aqe-b").toString
    (0 until 1000).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirA)
    (0 until 200).map(i => (i.toLong, s"g${i % 4}")).toDF("bid", "g")
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirB)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val a = spark.read.format("columnfile").load(dirA)
      val b = spark.read.format("columnfile").load(dirB)
      val joined = a.join(b, "g").groupBy("g").count()
      val n = joined.collect().map(_.getLong(1)).sum // execute under AQE
      assert(n == 250L * 50L * 4L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      val joinSection = finalPlan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(finalPlan.contains("SortMergeJoin"), s"expected SMJ:\n$finalPlan")
      assert(!joinSection.contains("Exchange"),
        s"AQE reintroduced a shuffle below the join:\n$finalPlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "false")
  }

  test("reported partition-column ordering removes BOTH sorts from the " +
    "storage-partitioned sort-merge join") {
    val sp = spark; import sp.implicits._
    val dirA = Files.createTempDirectory("cf-ord-a").toString
    val dirB = Files.createTempDirectory("cf-ord-b").toString
    // ONE data file per key dir (what compaction writes): Spark's
    // exec-side gate only trusts a scan's ordering when no key group
    // concatenates multiple splits
    (0 until 900).map(i => (i.toLong, s"g${i % 4}", i * 3.0))
      .toDF("id", "g", "x").repartition(col("g"))
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirA)
    (0 until 300).map(i => (i.toLong, s"g${i % 4}", s"n$i"))
      .toDF("bid", "g", "name").repartition(col("g"))
      .write.format("columnfile").partitionBy("g").mode("overwrite").save(dirB)
    val a = spark.read.format("columnfile").load(dirA)
    val b = spark.read.format("columnfile").load(dirB)
    val joined = a.join(b, "g")
    val exec = joined.queryExecution.executedPlan
    assert(exec.toString.contains("SortMergeJoin"), exec.toString)
    val sorts = exec.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty,
      s"scan-reported ordering should elide the SMJ sorts:\n$exec")
    assert(joined.count() == (900L / 4) * (300L / 4) * 4)
  }

  test("orderedBy reports a validated data-column order: an ordered " +
    "consumer plans zero sorts; a wrong declaration fails loudly") {
    val sp = spark; import sp.implicits._
    // a compacted doc-ordered table consumed IN ORDER per partition
    // (the merge-reader shape: columnfile-sort.cc:337-342 trusts
    // pre-sorted runs) — the report composes the partition-column
    // prefix with the validated data column, so the per-partition
    // sort is elided entirely
    val dirA = Files.createTempDirectory("cf-ord2-a").toString
    (0 until 2000).map(i => (i.toLong, s"g${i % 4}", i * 2.0))
      .toDF("id", "g", "x")
      .repartition(col("g")).sortWithinPartitions("id")
      .write.format("columnfile").partitionBy("g")
      .mode("overwrite").save(dirA)
    val a = spark.read.format("columnfile").option("orderedBy", "id")
      .load(dirA)
    val q = a.where("x >= 100.0").sortWithinPartitions("g", "id")
    val exec = q.queryExecution.executedPlan
    val sorts = exec.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty,
      s"reported (partition prefix, orderedBy) should satisfy the " +
        s"per-partition sort:\n$exec")
    assert(q.count() == 1950)
    // without the option the same consumer pays a real sort — the
    // report, not some other rewrite, is what removed it
    val plain = spark.read.format("columnfile").load(dirA)
      .where("x >= 100.0").sortWithinPartitions("g", "id")
    assert(plain.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.nonEmpty)
    // the declaration is machine-validated against chunk stats: an
    // UNSORTED table read with orderedBy fails at planning with a
    // diagnosable message — it can never silently serve wrong order
    val dirC = Files.createTempDirectory("cf-ord2-c").toString
    // small chunks so the file carries several (min, max) ranges —
    // a single-chunk file has no chunk pair to contradict the claim
    (0 until 5000).map(i => (((i * 7919) % 5000).toLong, s"v$i"))
      .toDF("id", "v")
      .coalesce(1).write.format("columnfile")
      .option("targetChunkBytes", "4096")
      .mode("overwrite").save(dirC)
    val bad = spark.read.format("columnfile").option("orderedBy", "id")
      .load(dirC)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex = intercept[Exception] { bad.orderBy("id").collect() }
    assert(messages(ex).exists(_.contains("NOT satisfied")),
      s"wrong-order declaration should fail loudly: $ex")
  }

  test("q75 merge-joins two ordered cf tables with zero exchanges " +
    "and zero sorts below the join") {
    val df = graft.SparkEntry
      .queries("q75_cf_ordered_join")(spark, "/root/testdata/sf0.001")
    val exec = df.queryExecution.executedPlan
    val p = exec.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    // the SMJ consumes the two scans directly: no exchange, no sort —
    // the scan-reported (b, doc_id) order and the key-grouped bucket
    // partitioning satisfy the join's requirements end to end
    val belowJoin = p.linesIterator
      .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
    assert(!belowJoin.contains("Exchange"),
      s"expected a storage-partitioned (shuffle-free) join:\n$p")
    val sorts = exec.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty,
      s"scan-reported ordering should elide the SMJ sorts:\n$p")
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  private def assertMergeNoSortNoExchange(
      df: org.apache.spark.sql.DataFrame): Unit = {
    val exec = df.queryExecution.executedPlan
    val p = exec.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    val belowJoin = p.linesIterator
      .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
    assert(!belowJoin.contains("Exchange"),
      s"expected a storage-partitioned (shuffle-free) join:\n$p")
    assert(exec.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      s"scan-reported ordering should elide the SMJ sorts:\n$p")
  }

  test("q76 merge-joins two SELF-DESCRIBING ordered tables (no read " +
    "option) with zero exchanges and zero sorts") {
    val df = graft.SparkEntry
      .queries("q76_cf_selfdescribing_join")(spark, "/root/testdata/sf0.001")
    assertMergeNoSortNoExchange(df)
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("q77 merge-joins on a COMPOSITE key (b, doc_id, seg) with zero " +
    "exchanges and zero sorts — the validated multi-column prefix") {
    val df = graft.SparkEntry
      .queries("q77_cf_composite_ordered_join")(spark, "/root/testdata/sf0.001")
    assertMergeNoSortNoExchange(df)
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }

  test("non-partitioned scans still plan and join normally") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-spj-c").toString
    (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("columnfile").mode("overwrite").save(dir)
    val t = spark.read.format("columnfile").load(dir)
    assert(t.join(t.select(col("id").as("id2")), col("id") === col("id2"))
      .count() == 100)
  }

  private def sortsIn(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }.length

  /** One sorted file per append: per-file (g const, id asc), several
    * chunks each — the multi-file shape a grouped compaction writes. */
  private def writeSortedByGid(dir: String, scrambleId: Boolean): Unit = {
    val sp = spark; import sp.implicits._
    for (g <- 0 until 4) {
      val rows = (0 until 1200)
        .map(i => (g.toLong,
          (if (scrambleId) (i * 7919) % 1200 else i).toLong, s"val$g-$i"))
        .toDF("g", "id", "v").coalesce(1)
      // scramble mode keeps input order: g constant (sorted trivially),
      // id genuinely out of order across chunk boundaries
      (if (scrambleId) rows else rows.sortWithinPartitions("g", "id"))
        .write.format("columnfile")
        .option("sortedBy", if (scrambleId) "g" else "g,id")
        .option("targetChunkBytes", "4096")
        .mode(if (g == 0) "overwrite" else "append").save(dir)
    }
  }

  test("self-describing sort order: a sortedBy write stamps the table, " +
    "a plain reader discovers the composite order and plans zero " +
    "sorts; an unstamped append clears the claim") {
    val dir = Files.createTempDirectory("cf-stamp-a").toString
    writeSortedByGid(dir, scrambleId = false)
    // NO read option: the stamp + chunk-stats validation alone report
    // the (g, id) per-partition order
    val q = spark.read.format("columnfile").load(dir)
      .where("id >= 3").sortWithinPartitions("g", "id")
    assert(sortsIn(q) == 0,
      s"discovered (g, id) order should elide the per-partition sort:\n" +
        q.queryExecution.executedPlan)
    assert(q.count() == 4 * 1197)
    // orderedBy=none opts out: same consumer pays a real sort — the
    // discovery, not some other rewrite, removed it above
    val optOut = spark.read.format("columnfile")
      .option("orderedBy", "none").load(dir)
      .where("id >= 3").sortWithinPartitions("g", "id")
    assert(sortsIn(optOut) > 0)
    // an append WITHOUT sortedBy clears the stamp: readers lose the
    // claim (and pay the sort) instead of failing on unsorted tails
    val sp = spark; import sp.implicits._
    Seq((9L, 5L, "tail")).toDF("g", "id", "v")
      .write.format("columnfile").mode("append").save(dir)
    val after = spark.read.format("columnfile").load(dir)
      .sortWithinPartitions("g", "id")
    assert(sortsIn(after) > 0,
      "unstamped append must drop the discovered ordering")
  }

  test("multi-column orderedBy reports the longest PROVABLE prefix: " +
    "a file sorted on g only serves exactly the 1-column report") {
    val dir = Files.createTempDirectory("cf-stamp-b").toString
    // per-file: g constant, id deliberately scrambled across chunk
    // boundaries; stamped (honestly) as sorted by g alone
    writeSortedByGid(dir, scrambleId = true)
    // an explicit 2-column declaration downgrades to the provable
    // 1-column prefix: (g) elides its sort, (g, id) cannot
    val gOnly = spark.read.format("columnfile")
      .option("orderedBy", "g,id").load(dir).sortWithinPartitions("g")
    assert(sortsIn(gOnly) == 0,
      s"provable prefix (g) should satisfy the g sort:\n" +
        gOnly.queryExecution.executedPlan)
    val gid = spark.read.format("columnfile")
      .option("orderedBy", "g,id").load(dir).sortWithinPartitions("g", "id")
    assert(sortsIn(gid) > 0,
      "the unprovable id leg must NOT be reported")
    // discovery path reads the honest 1-column stamp the write left
    val disc = spark.read.format("columnfile").load(dir)
      .sortWithinPartitions("g")
    assert(sortsIn(disc) == 0)
  }

  test("a hand-edited (stale) stamp fails loudly at planning, never " +
    "serves wrong order") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-stamp-c").toString
    // unsorted table, several chunks
    (0 until 5000).map(i => (((i * 7919) % 5000).toLong, s"v$i"))
      .toDF("id", "v")
      .coalesce(1).write.format("columnfile")
      .option("targetChunkBytes", "4096")
      .mode("overwrite").save(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_sort_order.json"),
      """{"cols":["id"]}""".getBytes("UTF-8"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex = intercept[Exception] {
      spark.read.format("columnfile").load(dir).orderBy("id").collect()
    }
    assert(messages(ex).exists(_.contains("NOT satisfied")),
      s"stale stamp should fail loudly: $ex")
  }

  test("a lying sortedBy fails AT WRITE TIME on the first out-of-order " +
    "row — single-chunk files included (r19 verdict: the stamp is a " +
    "verified fact, not a declaration)") {
    val sp = spark; import sp.implicits._
    val conf = spark.sessionState.newHadoopConf()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    // unsorted rows, default chunk size => ONE chunk per file: chunk
    // range stats have no boundary to refute, so before write-time
    // verification this table would stamp and serve a zero-sort merge
    // join over unsorted rows
    val dir = Files.createTempDirectory("cf-wverify-a").toString
    val ex = intercept[Exception] {
      (0 until 100).map(i => (((i * 37) % 100).toLong, s"v$i"))
        .toDF("id", "v").coalesce(1)
        .write.format("columnfile").option("sortedBy", "id")
        .mode("overwrite").save(dir)
    }
    assert(messages(ex).exists(m =>
      m.contains("sortedBy=id violated") && m.contains("'id' decreases")),
      s"lying sortedBy must fail the write: $ex")
    assert(SortOrderStamp.read(conf,
      new org.apache.hadoop.fs.Path(dir)).isEmpty,
      "a failed write must not publish a stamp")
    // the same rows sorted write fine and publish the verified stamp
    val ok = Files.createTempDirectory("cf-wverify-b").toString
    (0 until 100).map(i => (((i * 37) % 100).toLong, s"v$i"))
      .toDF("id", "v").coalesce(1).sortWithinPartitions("id")
      .write.format("columnfile").option("sortedBy", "id")
      .mode("overwrite").save(ok)
    assert(SortOrderStamp.read(conf,
      new org.apache.hadoop.fs.Path(ok)).contains(Seq("id")))
    // multi-column: the violating COLUMN is named (g constant, id
    // decreasing => 'id' is the refuted leg)
    val dir2 = Files.createTempDirectory("cf-wverify-c").toString
    val ex2 = intercept[Exception] {
      Seq((1L, 5L), (1L, 3L)).toDF("g", "id").coalesce(1)
        .write.format("columnfile").option("sortedBy", "g,id")
        .mode("overwrite").save(dir2)
    }
    assert(messages(ex2).exists(_.contains("'id' decreases")), ex2.toString)
  }

  test("write-time sortedBy verification orders NULLS FIRST (Spark's " +
    "ascending default): null-then-value verifies, value-then-null fails") {
    val sp = spark; import sp.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val okDir = Files.createTempDirectory("cf-wverify-n1").toString
    Seq[(java.lang.Long, String)]((null, "a"), (1L, "b"), (2L, "c"))
      .toDF("id", "v").coalesce(1)
      .write.format("columnfile").option("sortedBy", "id")
      .mode("overwrite").save(okDir)
    assert(SortOrderStamp.read(conf,
      new org.apache.hadoop.fs.Path(okDir)).contains(Seq("id")))
    val badDir = Files.createTempDirectory("cf-wverify-n2").toString
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val ex = intercept[Exception] {
      Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"))
        .toDF("id", "v").coalesce(1)
        .write.format("columnfile").option("sortedBy", "id")
        .mode("overwrite").save(badDir)
    }
    assert(messages(ex).exists(_.contains("violated")), ex.toString)
  }

  test("an append with a narrower sortedBy narrows the stamp to the " +
    "common prefix instead of lying about prior files") {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("cf-stamp-d").toString
    writeSortedByGid(dir, scrambleId = false) // stamp: (g, id)
    assert(SortOrderStamp.read(
      spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(dir)).contains(Seq("g", "id")))
    Seq((8L, 0L, "t0"), (8L, 1L, "t1")).toDF("g", "id", "v")
      .coalesce(1).sortWithinPartitions("g")
      .write.format("columnfile").option("sortedBy", "g")
      .mode("append").save(dir)
    assert(SortOrderStamp.read(
      spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(dir)).contains(Seq("g")))
    // and a sortedBy append onto an UNSTAMPED multi-file table makes
    // no claim (prior files are not vouched for)
    val dir2 = Files.createTempDirectory("cf-stamp-e").toString
    Seq((1L, "a")).toDF("id", "v").write.format("columnfile")
      .mode("overwrite").save(dir2)
    Seq((2L, "b")).toDF("id", "v").write.format("columnfile")
      .option("sortedBy", "id").mode("append").save(dir2)
    assert(SortOrderStamp.read(
      spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(dir2)).isEmpty)
  }
}
