package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Data-vintage regression net for the driver-provided tables.
  *
  * Round 8 lost ~20 queries to one line of schema drift: `events.ts`
  * changed from TIMESTAMP(NANOS) (readable only as long via the
  * `nanosAsLong` legacy conf) to TIMESTAMP(MICROS) `isAdjustedToUTC=
  * false` (read as TIMESTAMP_NTZ), the loader threw, and the
  * half-registered session poisoned every later query. These cases pin
  * (a) the normalized dtype every downstream query sees and (b) that
  * registration survives a bad table without losing the functions or
  * the other views.
  */
class TablesSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("tables-schema-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("tables_schema").toString

  test("events normalizes ts to TimestampType for every shipped vintage") {
    // current driver vintage, whatever it is
    assert(Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)

    // long (nanos-as-long) vintage
    val longDir = tmpDir()
    spark.range(3).selectExpr(
      "id AS event_id", "id * 1000000000 AS ts", "id AS user_id",
      "'view' AS event_type", "CAST(id AS DOUBLE) AS value", "'{}' AS props")
      .write.parquet(s"$longDir/events.parquet")
    val fromLong = Tables.events(spark, longDir)
    assert(fromLong.schema("ts").dataType == TimestampType)

    // TIMESTAMP_NTZ (micros, isAdjustedToUTC=false) vintage
    val ntzDir = tmpDir()
    spark.range(3).selectExpr(
      "id AS event_id",
      "CAST(timestamp_micros(id * 1000000) AS TIMESTAMP_NTZ) AS ts",
      "id AS user_id", "'view' AS event_type",
      "CAST(id AS DOUBLE) AS value", "'{}' AS props")
      .write.parquet(s"$ntzDir/events.parquet")
    val fromNtz = Tables.events(spark, ntzDir)
    assert(fromNtz.schema("ts").dataType == TimestampType)

    // identical wall-clock values from both vintages (session TZ = UTC)
    val a = fromLong.select("ts").collect().map(_.getTimestamp(0)).sorted
    val b = fromNtz.select("ts").collect().map(_.getTimestamp(0)).sorted
    assert(a.sameElements(b), s"${a.toSeq} vs ${b.toSeq}")
  }

  test("lineitem vintages: decimal prices, int32 keys, DATE shipdate") {
    // a plausible future vintage: DECIMAL(12,2) money columns, narrow
    // int keys, shipdate as DATE — every one must coerce back to the
    // canonical (hash-matched) schema
    val d = tmpDir()
    spark.sql(
      """SELECT CAST(1 AS INT) AS l_orderkey, CAST(2 AS INT) AS l_partkey,
        |  CAST(3 AS INT) AS l_suppkey, CAST(1 AS SMALLINT) AS l_linenumber,
        |  CAST(17.5 AS DECIMAL(12,2)) AS l_quantity,
        |  CAST(1234.56 AS DECIMAL(12,2)) AS l_extendedprice,
        |  CAST(0.05 AS DECIMAL(12,2)) AS l_discount,
        |  CAST(0.02 AS DECIMAL(12,2)) AS l_tax,
        |  'N' AS l_returnflag, 'O' AS l_linestatus,
        |  DATE'1996-03-13' AS l_shipdate""".stripMargin)
      .write.parquet(s"$d/lineitem.parquet")
    val li = Tables.t(spark, d, "lineitem")
    assert(li.schema("l_orderkey").dataType == LongType)
    assert(li.schema("l_linenumber").dataType == IntegerType)
    assert(li.schema("l_quantity").dataType == DoubleType)
    assert(li.schema("l_extendedprice").dataType == DoubleType)
    // canonical = the shipped NTZ vintage (what the inventory hash-matched on)
    assert(li.schema("l_shipdate").dataType == TimestampNTZType)
    val r = li.selectExpr("l_extendedprice", "CAST(l_shipdate AS STRING) s")
      .collect().head
    assert(r.getDouble(0) == 1234.56)
    assert(r.getString(1).startsWith("1996-03-13"))
  }

  test("embeddings vintages: double elements coerce to array<float>") {
    val d = tmpDir()
    spark.sql(
      """SELECT CAST(1 AS INT) AS vec_id,
        |  array(CAST(0.25 AS DOUBLE), CAST(-1.5 AS DOUBLE)) AS embedding,
        |  CAST(7 AS BIGINT) AS label""".stripMargin)
      .write.parquet(s"$d/embeddings.parquet")
    val e = Tables.t(spark, d, "embeddings")
    assert(e.schema("vec_id").dataType == LongType)
    assert(e.schema("embedding").dataType.catalogString == "array<float>")
    assert(e.schema("label").dataType == IntegerType)
    val v = e.selectExpr("embedding[0]", "embedding[1]").collect().head
    assert(v.getFloat(0) == 0.25f && v.getFloat(1) == -1.5f)
  }

  test("documents/orders vintages: int widths and NTZ dates coerce") {
    val d = tmpDir()
    spark.sql(
      """SELECT CAST(1 AS INT) AS doc_id, 'hello' AS text, 'en' AS lang,
        |  'web' AS source, CAST(5 AS INT) AS n_chars""".stripMargin)
      .write.parquet(s"$d/documents.parquet")
    spark.sql(
      """SELECT CAST(9 AS INT) AS o_orderkey, CAST(4 AS INT) AS o_custkey,
        |  'O' AS o_orderstatus, CAST(10.5 AS FLOAT) AS o_totalprice,
        |  DATE'1970-01-02' AS o_orderdate,
        |  '1-URGENT' AS o_orderpriority""".stripMargin)
      .write.parquet(s"$d/orders.parquet")
    val docs = Tables.t(spark, d, "documents")
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    val ord = Tables.t(spark, d, "orders")
    assert(ord.schema("o_orderkey").dataType == LongType)
    assert(ord.schema("o_totalprice").dataType == DoubleType)
    assert(ord.schema("o_orderdate").dataType == TimestampNTZType)
    assert(ord.selectExpr("CAST(o_orderdate AS STRING) s").collect()
      .head.getString(0).startsWith("1970-01-02"))
  }

  test("current vintage: coercion is a no-op on every shipped table") {
    // events excluded: its shipped vintage is TIMESTAMP_NTZ, which the
    // canonical map intentionally normalizes to TimestampType (covered
    // by the vintage test above)
    for (n <- Seq("lineitem", "orders", "customer", "supplier", "part",
                  "nation", "region", "documents", "embeddings")) {
      val raw = spark.read.parquet(s"$sfDir/$n.parquet")
      val normalized = Tables.t(spark, sfDir, n)
      assert(normalized.schema.map(f => (f.name, f.dataType.catalogString))
        == raw.schema.map(f => (f.name, f.dataType.catalogString)),
        s"table $n: canonical map drifted from the shipped vintage")
    }
  }

  test("registerAll survives a bad events table: functions + views stay") {
    // a dir whose events.parquet has a ts type the normalizer does not
    // accept pairs with good copies of the other tables
    val badDir = tmpDir()
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.parquet(s"$badDir/documents.parquet")
    spark.range(3).selectExpr("id AS event_id", "'oops' AS ts")
      .write.parquet(s"$badDir/events.parquet")

    val session = spark.newSession()
    session.conf.set("spark.sql.session.timeZone", "UTC")
    // events normalization passes STRING through untouched; downstream
    // date functions would fail, but registration itself must complete
    Tables.registerAll(session, badDir)
    assert(session.catalog.tableExists("documents"))
    // graft_* functions must exist regardless of any table's health
    assert(session.sql("SELECT graft_polyhash('x') AS h").count() == 1)
  }

  test("cf cache keys track source content, not just the dir path") {
    // regenerated testdata at the SAME path must get a fresh cache dir
    val d = tmpDir()
    spark.range(5).toDF("id").write.parquet(s"$d/documents.parquet")
    val p1 = Tables.cachePath(d, "documents-lz4")
    assert(p1 == Tables.cachePath(d, "documents-lz4"), "stamp must be stable")
    // simulate the driver rewriting the table in place (new mtime/size)
    Thread.sleep(1100) // mtime granularity can be a full second
    spark.range(7).toDF("id").write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    // memoized per-JVM: real runs get a fresh JVM per round; the test
    // drops the memo to observe the rewrite
    Tables.forgetDirStamp(d)
    val fresh = Tables.cachePath(d, "documents-lz4")
    assert(fresh != p1, "regenerated source data must change the cache key")
  }

  test("a throw during registerAll does not poison the session cache") {
    val goneDir = tmpDir() + "/does-not-exist"
    val session = spark.newSession()
    session.conf.set("spark.sql.session.timeZone", "UTC")
    // nothing exists: registerAll registers functions, no views, succeeds
    Tables.registerAll(session, goneDir)
    // later call with a real dir must register views (cache keyed by dir)
    Tables.registerAll(session, sfDir)
    assert(session.catalog.tableExists("events"))
    assert(session.table("events").schema("ts").dataType == TimestampType)
  }
}
