package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Intent tests for the round-10 pipeline operators (d15/d16/p11) on
  * planted fixtures. The oracle gate proves cross-engine agreement on
  * the shared formulation; these prove the formulation computes the
  * thing it claims to: d15 separates CONTIGUOUS duplicated spans from
  * scattered shared shingles, d16 drops only within-cell semantic
  * near-dups (min-id-wins) after exact collapse, and p11's integer
  * HyperLogLog lands inside its error envelope.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pipeline-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(
      spark.sessionState.functionRegistry)
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("d15: contiguous duplicated block vs scattered shared shingles") {
    val sp = spark; import sp.implicits._
    val block = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // 12-word block shared verbatim -> run of 10 shingles, span 12
      (1L, s"u1a u1b $block u1c u1d", "en"),
      (2L, s"u2a u2b $block u2c", "en"),
      // two scattered 3-word overlaps -> runs of 1 shingle, span 3
      (3L, "x1 x2 s1 s2 s3 x3 x4 x5 s4 s5 s6 x6 x7", "en"),
      (4L, "y1 y2 s1 s2 s3 y3 y4 y5 s4 s5 s6 y6 y7", "en"),
      // nothing shared -> span 0
      (5L, "z1 z2 z3 z4 z5 z6 z7 z8", "en"))
    docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")

    val got = ExtQueries.TestSql.dupSpan(spark)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // bucket 0: docs 3,4 (span 3) + doc 5 (span 0); bucket 1: docs 1,2
    assert(got == Set(("en", 0L, 3L, 3L), ("en", 1L, 2L, 12L)))
  }

  test("d16: exact collapse + within-cell min-id-wins drop") {
    val sp = spark; import sp.implicits._
    def vec(pairs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      pairs.foreach { case (i, v) => a(i) = v }
      a
    }
    val a = vec(0 -> 1.0f)                      // cell 0 anchor
    val b = vec(0 -> 1.0f, 1 -> 0.1f)           // cos(a,b) ~ 0.995 -> dropped
    val c = vec(0 -> 0.3f, 2 -> 0.954f)         // cos(a,c) = 0.3 -> kept
    val e2 = vec(3 -> 1.0f)                     // cell 1 anchor
    val d2 = vec(3 -> 0.3f, 4 -> 0.954f)        // cos(e2,d2) = 0.3 -> kept
    val vecs = Seq(
      (10L, a, 0), (11L, b, 0), (12L, c, 0),
      (20L, e2, 1), (21L, d2, 1),
      (99L, a, 0)) // exact duplicate of a -> collapses into rep 10
    vecs.toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("embeddings")

    val got = ExtQueries.TestSql.semanticDedup(spark)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // cell 0: reps {10,11,12}, 11 dropped by 10, members 4 (99 collapsed)
    // cell 1: reps {20,21}, nothing within tau
    assert(got == Set((0, 3L, 1L, 4L), (1, 2L, 0L, 2L)))
  }

  test("p11: HLL estimate inside the error envelope, exact below it") {
    val sp = spark; import sp.implicits._
    val events =
      (1L to 1000L).map(u => ("x", u)) ++       // 1000 distinct users
        (1L to 1000L).map(u => ("x", u)) ++     // duplicates change nothing
        (1L to 8L).map(u => ("y", u))           // small group
    events.toDF("event_type", "user_id").createOrReplaceTempView("events")

    val got = spark.sql(ExtQueries.TestSql.hll)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got("x")._1 == 1000L)
    // raw HLL estimator, m=64: sigma ~ 13%; accept 3 sigma
    assert(got("x")._2 > 600L && got("x")._2 < 1500L,
      s"estimate ${got("x")._2} outside envelope")
    assert(got("y")._1 == 8L)
    // tiny cardinalities under-estimate without linear counting; just
    // pin determinism and positivity here
    assert(got("y")._2 > 0L)
  }

  test("p11: registers merge by register-wise MAX across shards") {
    val sp = spark; import sp.implicits._
    val events = (1L to 2000L).map(u => ("x", u))
    events.toDF("event_type", "user_id").createOrReplaceTempView("ev_all")
    // shard split that partitions the users (any disjoint cover works)
    spark.sql("SELECT * FROM ev_all WHERE user_id % 2 = 0")
      .createOrReplaceTempView("ev_a")
    spark.sql("SELECT * FROM ev_all WHERE user_id % 2 = 1")
      .createOrReplaceTempView("ev_b")

    val whole = spark.sql(ExtQueries.TestSql.hllRegisters("ev_all"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    val merged = spark.sql(
      s"""SELECT event_type, bucket, MAX(mj) AS mj FROM (
         |  ${ExtQueries.TestSql.hllRegisters("ev_a")}
         |  UNION ALL
         |  ${ExtQueries.TestSql.hllRegisters("ev_b")}) u
         |GROUP BY event_type, bucket""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(whole == merged)
    // and the estimate readout over merged registers equals the whole's
    spark.sql(ExtQueries.TestSql.hllRegisters("ev_all"))
      .createOrReplaceTempView("regs_whole")
    spark.sql(
      s"""SELECT event_type, bucket, MAX(mj) AS mj FROM (
         |  ${ExtQueries.TestSql.hllRegisters("ev_a")}
         |  UNION ALL
         |  ${ExtQueries.TestSql.hllRegisters("ev_b")}) u
         |GROUP BY event_type, bucket""".stripMargin)
      .createOrReplaceTempView("regs_merged")
    val eW = spark.sql(ExtQueries.TestSql.hllEstimate("regs_whole"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eM = spark.sql(ExtQueries.TestSql.hllEstimate("regs_merged"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eW == eM)
  }
}
