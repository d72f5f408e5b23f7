package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** VariantType as a storable leaf: the open-schema column the
  * reference's capnp shredder explicitly TODOs (unions,
  * columnfile-capnp.cc:96,205). Cells store the VariantVal's two binary
  * parts varint-framed; round-trips must preserve them bit-exactly so
  * `variant_get` extraction after a cf round-trip matches extraction
  * from the original.
  */
class VariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("variant-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // crisp plan trees
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("variant columns round-trip through the cf format bit-exactly") {
    val dir = Files.createTempDirectory("cf-variant").toString
    val src = spark.sql(
      """SELECT id,
        |  parse_json(CASE
        |    WHEN id % 4 = 0 THEN concat('{"kind":"num","v":', id, '}')
        |    WHEN id % 4 = 1 THEN concat('{"kind":"str","v":"s', id, '","tags":["a","b"]}')
        |    WHEN id % 4 = 2 THEN concat('{"kind":"nested","v":{"x":', id, ',"y":[1,2,3]}}')
        |    ELSE 'null'
        |  END) AS v
        |FROM range(200)""".stripMargin)
    src.write.format("columnfile").mode("overwrite").save(dir)
    val back = spark.read.format("columnfile").load(dir)
    assert(back.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType)
    assert(back.count() == 200)
    // bit-exact: to_json of the variant matches the original's
    val a = src.selectExpr("id", "to_json(v) AS j")
    val b = back.selectExpr("id", "to_json(v) AS j")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // typed extraction works on the round-tripped column
    val nums = back.where("variant_get(v, '$.kind', 'string') = 'num'")
      .selectExpr("CAST(variant_get(v, '$.v', 'long') AS LONG) AS n")
      .agg(sum("n")).head.getLong(0)
    assert(nums == (0L until 200L by 4).sum)
    // nested path extraction
    val ys = back.where("variant_get(v, '$.kind', 'string') = 'nested'")
      .selectExpr("variant_get(v, '$.v.y[2]', 'int') AS y2")
      .collect()
    assert(ys.nonEmpty && ys.forall(_.getInt(0) == 3))
  }

  test("variant inside nested structures (array of variant, struct field)") {
    val dir = Files.createTempDirectory("cf-variant-nested").toString
    val src = spark.sql(
      """SELECT id,
        |  array(parse_json(concat('{"i":', id, '}')), NULL) AS arr,
        |  named_struct('tag', concat('t', id),
        |               'payload', parse_json(concat('[', id, ',', id + 1, ']'))) AS st
        |FROM range(50)""".stripMargin)
    src.write.format("columnfile").mode("overwrite").save(dir)
    val back = spark.read.format("columnfile").load(dir)
    val a = src.selectExpr("id", "to_json(arr[0]) AS a0", "arr[1] IS NULL AS a1n",
      "st.tag AS tag", "to_json(st.payload) AS pj")
    val b = back.selectExpr("id", "to_json(arr[0]) AS a0", "arr[1] IS NULL AS a1n",
      "st.tag AS tag", "to_json(st.payload) AS pj")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("shredded-path variant_get filters push into the scan, prune " +
    "chunks, and drop the variant payload from the read") {
    import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val dir = Files.createTempDirectory("cf-variant-shred").toString
    // 10k docs, price == id, sorted by the shredded leaf; tiny chunks
    // so range probes have something to prune
    spark.sql(
      """SELECT id, parse_json(concat('{"price":', id, ',"s":"x', id,
        |  '"}')) AS v FROM range(10000)""".stripMargin)
      .select(col("id"), col("v"),
        expr("variant_get(v, '$.price', 'bigint')")
          .as("v_price", VariantShred.shredMeta("v", "$.price")))
      .orderBy("v_price")
      .write.format("columnfile").option("targetChunkBytes", "4096")
      .mode("overwrite").save(dir)
    spark.read.format("columnfile").load(dir)
      .createOrReplaceTempView("vshred")
    val q = spark.sql(
      """SELECT CAST(SUM(variant_get(v, '$.price', 'bigint')) AS BIGINT)
        |    AS s, COUNT(*) AS n
        |FROM vshred
        |WHERE variant_get(v, '$.price', 'bigint')
        |  BETWEEN 100 AND 199""".stripMargin)
    val row = q.head()
    assert(row.getLong(0) == (100L to 199L).sum && row.getLong(1) == 100L)
    val exec = q.queryExecution.executedPlan
    // the rewrite fired: no VariantGet survives anywhere in the plan
    val vgs = exec.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case g: VariantGet => g })
    assert(vgs.isEmpty, s"live VariantGet in the plan:\n$exec")
    val scan = exec.collect { case b: BatchScanExec => b }.head
    // the variant payload is pruned from the read schema entirely
    assert(!scan.output.map(_.name).contains("v"),
      s"variant column still read: ${scan.output}")
    // the range filter reached the scan as a plain pushed filter
    assert(scan.toString.contains("v_price"),
      s"shred filter not pushed:\n$scan")
    // chunk pruning: the selective probe plans fewer partitions than
    // the full scan of the same leaf
    val fullScan = spark.sql("SELECT v_price FROM vshred")
      .queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head
    assert(scan.inputRDD.partitions.length <
      fullScan.inputRDD.partitions.length,
      s"no chunk pruning: ${scan.inputRDD.partitions.length} vs " +
        s"${fullScan.inputRDD.partitions.length}")
    // pruning soundness on the shredded leaf: random ranges return
    // exactly the arithmetic truth (pruning never drops a match)
    val rnd = new scala.util.Random(20260815L)
    (1 to 20).foreach { _ =>
      val lo = rnd.nextInt(11000) - 500
      val hi = lo + rnd.nextInt(2000)
      val got = spark.sql(
        s"""SELECT COUNT(*) AS n FROM vshred
           |WHERE variant_get(v, '$$.price', 'bigint')
           |  BETWEEN $lo AND $hi""".stripMargin).head().getLong(0)
      val expect = math.max(0, math.min(hi, 9999) - math.max(lo, 0) + 1)
      assert(got == expect, s"range [$lo,$hi]: $got vs $expect")
    }
  }

  /** Writes a tiny shredded table: (id, v variant {p: id * mult},
    * vp = shred of $.p) and registers it as `name`. */
  private def writeShredded(name: String, mult: Int): Unit = {
    val dir = Files.createTempDirectory(s"cf-vs-$name").toString
    spark.sql(
      s"""SELECT id, parse_json(concat('{"p":', id * $mult, '}')) AS v
         |FROM range(100)""".stripMargin)
      .select(col("id"), col("v"),
        expr("variant_get(v, '$.p', 'bigint')")
          .as("vp", VariantShred.shredMeta("v", "$.p")))
      .write.format("columnfile").mode("overwrite").save(dir)
    spark.read.format("columnfile").load(dir).createOrReplaceTempView(name)
  }

  test("lineage-bound rewrite: a join of two same-named shredded " +
    "variants substitutes each side's OWN leaf, correctly") {
    import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
    writeShredded("vs_left", 1)
    writeShredded("vs_right", 1000)
    // Both sides expose `v` and a shred of "v": a name-keyed
    // substitution could serve the LEFT row's leaf for the RIGHT
    // side's variant_get. The lineage binding (shred co-occurs with
    // ITS variant in one leaf relation) pairs each variant_get with
    // its own side's leaf — both rewrite, both correct.
    val q = spark.sql(
      """SELECT l.id,
        |  CAST(variant_get(l.v, '$.p', 'bigint') AS BIGINT) AS lp,
        |  CAST(variant_get(r.v, '$.p', 'bigint') AS BIGINT) AS rp
        |FROM vs_left l JOIN vs_right r ON l.id = r.id""".stripMargin)
    val rows = q.collect()
    assert(rows.length == 100)
    rows.foreach { row =>
      val id = row.getLong(0)
      assert(row.getLong(1) == id, s"left leaf wrong for $id: $row")
      assert(row.getLong(2) == id * 1000L, s"right leaf wrong for $id: $row")
    }
    val live = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case g: VariantGet => g })
    assert(live.isEmpty,
      s"lineage-bound matches should rewrite both sides; live: $live")
    // single-table read still rewrites
    val solo = spark.sql(
      """SELECT CAST(SUM(variant_get(v, '$.p', 'bigint')) AS BIGINT) AS s
        |FROM vs_left""".stripMargin)
    assert(solo.head.getLong(0) == (0L until 100L).sum)
    val soloLive = solo.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case g: VariantGet => g })
    assert(soloLive.isEmpty, "single-table shred read must still rewrite")
  }

  test("an ORPHANED shred (its variant projected away) never pairs with " +
    "a different table's same-named variant") {
    import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
    writeShredded("vs_orph_l", 7)
    writeShredded("vs_orph_r", 1000)
    // Left subquery keeps only the shred leaf (drops its own `v`);
    // right exposes an unshredded-looking `v` (its shred is also
    // dropped). The join child then shows exactly one attribute named
    // `v` (right's) and one provenance-matching shred (left's orphan,
    // ShredOf = "v") — a name-count guard fires here and serves the
    // LEFT table's values for the RIGHT variant_get. Lineage binding
    // must refuse: the orphan and the variant live in different leaf
    // relations.
    val q = spark.sql(
      """SELECT l.id, l.vp AS orphan_leaf,
        |  CAST(variant_get(r.v, '$.p', 'bigint') AS BIGINT) AS rp
        |FROM (SELECT id, vp FROM vs_orph_l) l
        |JOIN (SELECT id, v FROM vs_orph_r) r ON l.id = r.id""".stripMargin)
    val rows = q.collect()
    assert(rows.length == 100)
    rows.foreach { row =>
      val id = row.getLong(0)
      assert(row.getLong(1) == id * 7L, s"orphan leaf wrong for $id: $row")
      assert(row.getLong(2) == id * 1000L,
        s"right variant_get served the WRONG table's leaf for $id: $row")
    }
    val live = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case g: VariantGet => g })
    assert(live.nonEmpty,
      "the orphaned-shred join must keep variant_get live")
  }

  test("declarative shred write option derives provenance-tagged leaves " +
    "the rewrite consumes") {
    import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
    val dir = Files.createTempDirectory("cf-shred-opt").toString
    spark.sql(
      """SELECT id, parse_json(concat('{"price_c":', id * 7,
        |  ',"status":"s', id % 3, '"}')) AS v FROM range(500)""".stripMargin)
      .orderBy(expr("variant_get(v, '$.price_c', 'bigint')"))
      .write.format("columnfile")
      .option("shred", "v:$.price_c:bigint,v:$.status:string")
      .option("targetChunkBytes", "2048")
      .mode("overwrite").save(dir)
    val back = spark.read.format("columnfile").load(dir)
    // the writer derived the leaves and published their provenance
    val priceField = back.schema("v_price_c")
    assert(priceField.dataType == org.apache.spark.sql.types.LongType)
    assert(priceField.metadata.getString(VariantShred.ShredOfKey) == "v" &&
      priceField.metadata.getString(VariantShred.ShredPathKey) == "$.price_c")
    assert(back.schema("v_status").metadata
      .getString(VariantShred.ShredPathKey) == "$.status")
    // the stored leaves equal the extraction row for row
    assert(back.where(
      "v_price_c <> variant_get(v, '$.price_c', 'bigint') OR " +
        "CAST(v_status AS STRING) <> " +
        "CAST(variant_get(v, '$.status', 'string') AS STRING)")
      .count() == 0)
    // and the read side rides them: rewrite fires, filter pushes,
    // variant payload pruned
    back.createOrReplaceTempView("shred_opt")
    val q = spark.sql(
      """SELECT CAST(SUM(variant_get(v, '$.price_c', 'bigint')) AS BIGINT)
        |    AS s, COUNT(*) AS n
        |FROM shred_opt
        |WHERE variant_get(v, '$.price_c', 'bigint') BETWEEN 70 AND 140""".stripMargin)
    val row = q.head()
    assert(row.getLong(1) == 11L && row.getLong(0) == (10L to 20L).map(_ * 7).sum)
    val exec = q.queryExecution.executedPlan
    val vgs = exec.collect { case p => p.expressions }.flatten
      .flatMap(_.collect { case g: VariantGet => g })
    assert(vgs.isEmpty, s"live VariantGet in the plan:\n$exec")
    val scan = exec.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head
    assert(!scan.output.map(_.name).contains("v"),
      s"variant column still read: ${scan.output}")
    // invalid specs fail at analysis, not silently
    def fails(opt: String): Unit = {
      val e = intercept[Exception] {
        spark.sql("SELECT id, parse_json('1') AS v FROM range(3)")
          .write.format("columnfile").option("shred", opt)
          .mode("overwrite")
          .save(Files.createTempDirectory("cf-shred-bad").toString)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("shred")), s"for $opt got $e")
    }
    fails("nope:$.x:bigint")       // no such column
    fails("id:$.x:bigint")         // not a variant
    fails("v:$.x:timestamp")       // timezone-sensitive target
    fails("v:$.x")                 // malformed spec
  }

  test("timezone-sensitive target types are never rewritten to a leaf") {
    import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
    val dir = Files.createTempDirectory("cf-vs-ts").toString
    // a STRING leaf falsely claiming to shred $.t at timestamp type
    // cannot be matched (type differs), and even a timestamp-typed
    // leaf must not substitute: the variant->timestamp cast is
    // session-timezone-dependent
    spark.sql(
      """SELECT id, parse_json(concat('{"t":"2026-0', 1 + id % 9,
        |  '-01 00:00:00"}')) AS v FROM range(20)""".stripMargin)
      .select(col("id"), col("v"),
        expr("variant_get(v, '$.t', 'timestamp')")
          .as("vt", VariantShred.shredMeta("v", "$.t")))
      .write.format("columnfile").mode("overwrite").save(dir)
    spark.read.format("columnfile").load(dir)
      .createOrReplaceTempView("vs_ts")
    val q = spark.sql(
      "SELECT variant_get(v, '$.t', 'timestamp') AS t FROM vs_ts")
    val live = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case g: VariantGet => g })
    assert(live.nonEmpty,
      "timestamp variant_get must stay live (timezone-sensitive)")
    assert(q.collect().length == 20)
  }
}
