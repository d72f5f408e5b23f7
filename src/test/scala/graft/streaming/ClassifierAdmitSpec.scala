package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Intent tests for the streaming classifier admission (q70): the
  * per-batch verdicts are boundary-independent (re-chunking the same
  * corpus into different micro-batches yields identical per-doc rows),
  * and the scorer is t20's exact integer arithmetic against the
  * supplied weight relation. The q70 oracle proves end-to-end
  * stream ≡ batch-t20 at sf0.01; these pin the per-batch function's
  * contract in isolation.
  */
class ClassifierAdmitSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("classifier-admit-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("per-doc verdicts are micro-batch-boundary independent and use " +
    "the exact integer-mean scorer") {
    val sp = spark; import sp.implicits._
    // two marker words with known buckets; weights planted per bucket
    val bucketOf = (w: String) =>
      spark.sql(s"SELECT graft_polyhash('$w') % 1024").head().getLong(0)
    val (bGood, bBad) = (bucketOf("good"), bucketOf("bad"))
    assume(bGood != bBad)
    val weights = Seq((bGood, 10L), (bBad, -20L))
      .toDF("bucket", "w")
    val docs = Seq(
      (1L, "good good good"),        // score 10 -> cls 1
      (2L, "bad bad"),               // score -20 -> cls 0
      (3L, "good bad"),              // (10 - 20) div 2 = -5 -> cls 0
      (4L, "good good bad"),         // (20 - 20) div 3 = 0 -> cls 1
      (5L, "unknownword"))           // no weighted bucket -> no verdict
    val all = docs.toDF("doc_id", "text")

    def run(df: org.apache.spark.sql.DataFrame) =
      ClassifierAdmit.perDocScores(df, weights)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet

    val whole = run(all)
    assert(whole == Set((1L, 10L, 1L), (2L, -20L, 0L),
      (3L, -5L, 0L), (4L, 0L, 1L)), whole.toString)
    // re-chunk: batches {1,4} / {2,5} / {3} — same verdicts
    val chunks = Seq(Seq(1L, 4L), Seq(2L, 5L), Seq(3L))
      .map(ids => all.where(ids.map(i => s"doc_id = $i").mkString(" OR ")))
    val rechunked = chunks.map(run).reduce(_ ++ _)
    assert(whole == rechunked)
  }

  test("quarantine routing (q71): verdicts land in cls= dirs, replay " +
    "overwrites both routes, and directory-derived cls matches the scorer") {
    val sp = spark; import sp.implicits._
    val bucketOf = (w: String) =>
      spark.sql(s"SELECT graft_polyhash('$w') % 1024").head().getLong(0)
    val (bGood, bBad) = (bucketOf("good"), bucketOf("bad"))
    assume(bGood != bBad)
    val weights = Seq((bGood, 10L), (bBad, -20L)).toDF("bucket", "w")
    val all = Seq(
      (1L, "good good good"),        // cls 1 -> admit dir
      (2L, "bad bad"),               // cls 0 -> reject dir
      (3L, "good bad"),              // cls 0
      (4L, "good good bad"))         // cls 1
      .toDF("doc_id", "text")
    val out = java.nio.file.Files
      .createTempDirectory("admit-quarantine").toString

    // q71's per-batch write: partitionBy(cls) under the batch dir
    def writeBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      ClassifierAdmit.perDocScores(df, weights)
        .write.format("columnfile").partitionBy("cls")
        .mode("overwrite").save(s"$out/batch=$id")

    writeBatch(all.where("doc_id <= 2"), 0L)
    writeBatch(all.where("doc_id >= 3"), 1L)
    // REPLAY batch 0 (a retried micro-batch): overwrite of the ONE
    // batch dir must leave both routes exactly as one attempt wrote them
    writeBatch(all.where("doc_id <= 2"), 0L)

    // directory shape: each batch dir holds ONLY cls= subdirs (plus
    // sidecar files), and both routes exist where both classes occur
    for (b <- Seq(0L, 1L)) {
      val subs = new java.io.File(s"$out/batch=$b").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted
      assert(subs.sameElements(Array("cls=0", "cls=1")), subs.mkString(","))
    }

    // read back with cls synthesized from the DIRECTORY names — the
    // physical routing proof: dir-derived cls must equal the scorer's
    val got = spark.read.format("columnfile")
      .load(s"$out/batch=0", s"$out/batch=1")
      .select("doc_id", "score", "cls")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 1L), (2L, -20L, 0L),
      (3L, -5L, 0L), (4L, 0L, 1L)), got.toString)
    // replay added nothing: 4 docs, 4 verdicts
    assert(got.size == 4)

    // a reviewer's scan of ONE route reads only that directory
    val rejects = spark.read.format("columnfile")
      .load(s"$out/batch=0", s"$out/batch=1")
      .where("cls = 0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rejects == Set(2L, 3L))
  }

  test("banded routing (q73): two-level cls/band directories match the " +
    "score arithmetic, and a one-band read sees only its shard") {
    val sp = spark; import sp.implicits._
    val bucketOf = (w: String) =>
      spark.sql(s"SELECT graft_polyhash('$w') % 1024").head().getLong(0)
    val (bGood, bBad) = (bucketOf("good"), bucketOf("bad"))
    assume(bGood != bBad)
    // weights chosen so scores hit bands 0, 1, and the 3 cap:
    // doc 1: +200 -> cls 1 band 3; doc 2: -60 -> cls 0 band 1;
    // doc 3: (200-60) div 2 = +70 -> cls 1 band 1; doc 4: -20 -> band 0
    val weights = Seq((bGood, 200L), (bBad, -60L)).toDF("bucket", "w")
    val all = Seq(
      (1L, "good good"), (2L, "bad"), (3L, "good bad"),
      (4L, "bad bad bad good"))   // (200-180) div 4 = 5 -> cls 1 band 0
      .toDF("doc_id", "text")
    val out = java.nio.file.Files
      .createTempDirectory("admit-banded").toString
    graft.streaming.ClassifierAdmit.perDocScores(all, weights)
      .selectExpr("doc_id", "score", "cls",
        "CAST(LEAST(abs(score) div 50, 3) AS BIGINT) AS band")
      .write.format("columnfile").partitionBy("cls", "band")
      .mode("overwrite").save(s"$out/batch=0")
    // two-level directory shape
    val lvl1 = new java.io.File(s"$out/batch=0").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(lvl1.sameElements(Array("cls=0", "cls=1")), lvl1.mkString(","))
    val cls1bands = new java.io.File(s"$out/batch=0/cls=1").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(cls1bands.sameElements(Array("band=0", "band=1", "band=3")),
      cls1bands.mkString(","))
    // both levels synthesized from directory names match the scorer
    val got = spark.read.format("columnfile").load(s"$out/batch=0")
      .select("doc_id", "score", "cls", "band")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((1L, 200L, 1L, 3L), (2L, -60L, 0L, 1L),
      (3L, 70L, 1L, 1L), (4L, 5L, 1L, 0L)), got.toString)
    // a reviewer's one-(cls, band) scan sees exactly its shard
    val borderline = spark.read.format("columnfile").load(s"$out/batch=0")
      .where("cls = 1 AND band = 0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(borderline == Set(4L))
  }
}
