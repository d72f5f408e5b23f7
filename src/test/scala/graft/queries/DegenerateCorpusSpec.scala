package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial exact-dup-flooded corpora for the LSH candidate
  * generators (d03/d05/v02/d07).
  *
  * Web-scale LLM corpora are full of exact duplicates; every duplicate
  * shares every band/bucket key, so WITHOUT the hot-bucket caps a flood
  * of N identical docs turns each generator's self-join into N^2/2
  * candidates in one reducer (N=10k here: ~50M pairs per band — these
  * tests would not finish). With the caps, flooded buckets are dropped
  * from candidate generation (exact dedup d01/d02 owns them) and
  * genuine pairs in cool buckets still come out exactly.
  */
class DegenerateCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val Flood = 10000

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("degenerate-corpus-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(
      spark.sessionState.functionRegistry)
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
    val sp = spark; import sp.implicits._

    // 10k identical documents + one planted near-dup pair (ids 1, 2)
    val floodText = "the quick brown fox jumps over the lazy dog again and again"
    val plantedText = "distributed columnar analytics engines shred nested rows into typed column streams"
    val docs =
      Seq((1L, plantedText), (2L, plantedText)) ++
        (1000L until (1000L + Flood)).map(i => (i, floodText))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")

    // 10k identical embeddings + a 10-vector cool bucket (ids 0-9)
    val floodVec = Array.fill(64)(-1.0f)
    val coolVec = Array.fill(64)(1.0f)
    val vecs =
      (0L until 10L).map(i => (i, coolVec)) ++
        (1000L until (1000L + Flood)).map(i => (i, floodVec))
    vecs.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("d03 MinHash-LSH: flood buckets capped, planted pair survives") {
    val got = ExtQueries.TestSql.minhashPairs(spark).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getDouble(2)) ==
      ((1L, 2L, 1.0)))
  }

  test("d05 SimHash pairs: flood buckets capped, planted pair survives") {
    val got = spark.sql(ExtQueries.TestSql.simhashPairs).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1),
      got(0).getAs[Number]("hamming").longValue) == ((1L, 2L, 0L)))
  }

  test("v02 sign-LSH ANN: flooded bucket capped, cool bucket still searched") {
    val got = spark.sql(ExtQueries.TestSql.knnSignLsh).collect()
    // 10 query vectors (vec_id < 50), 5 neighbors each, all from the
    // cool bucket; no flood id anywhere
    assert(got.length == 50)
    assert(got.forall(r => r.getLong(0) < 10 && r.getLong(1) < 10))
    assert(got.forall(_.getDouble(2) == 1.0))
  }

  test("d07 embedding-cosine dedup: flooded bucket capped in all 4 tables") {
    val got = spark.sql(ExtQueries.TestSql.embeddingDedup).collect()
    // C(10,2) cool-bucket pairs only
    assert(got.length == 45)
    assert(got.forall(r => r.getLong(0) < 10 && r.getLong(1) < 10))
    assert(got.forall(_.getDouble(2) == 1.0))
  }

  test("d11 cap report: the flood's dropped buckets and rows are visible, not silent") {
    val cap = ExtQueries.TestSql.hotBucketCap
    val rows = spark.sql(ExtQueries.TestSql.lshCapReport).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet == Set("0", "1", "2", "3"))
    rows.foreach { case (band, (nMulti, nDroppedBuckets, rowsDropped, maxBucket)) =>
      // every band: the 10k identical docs share one bucket -> exactly
      // one over-cap bucket, all Flood rows reported dropped, and the
      // planted pair's bucket keeps the multi count >= 2 buckets' worth
      assert(nDroppedBuckets == 1L, s"band $band dropped buckets")
      assert(rowsDropped == Flood.toLong, s"band $band rows dropped")
      assert(maxBucket == Flood.toLong, s"band $band max bucket")
      assert(nMulti >= 2L, s"band $band multi-occupancy buckets")
      assert(maxBucket > cap)
    }
  }

  test("d08 keep-best: exact-dup-only groups survive the collapsed edge set") {
    // Both groups in this corpus are exact-dup-only: after collapse the
    // flood is ONE representative (1000) and the planted pair's texts are
    // identical too (rep 1), so NO rep-level LSH pair exists anywhere.
    // With collapse edges oriented (i=member, j=rep) — the pre-round-10
    // bug — d08's `gkey IN (SELECT i FROM pairs)` filter saw neither rep
    // in column i and returned ZERO rows here. The (i=rep, j=member)
    // orientation keeps the global i < j invariant and both groups.
    val got = ExtQueries.TestSql.keepBestCollapsed(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L), (1000L, 1000L)))
  }

  test("d12 collapsed minhash: a pure-exact-dup corpus emits zero pairs, bounded") {
    // every duplicate structure here is EXACT (the flood and the planted
    // pair are both identical texts), so after collapse the two reps
    // share no shingles — the bounded contract's answer is empty, and
    // the query finishes without the cap ever being the thing that
    // saves it (the band relation is rep-level: 2 rows, not 10k)
    assert(ExtQueries.TestSql.minhashCollapsed(spark).collect().isEmpty)
  }

  test("d17 collapsed simhash: a pure-exact-dup corpus stays rep-level bounded") {
    // Same corpus as d12's test: both duplicate structures are EXACT, so
    // after collapse the band self-join sees TWO representatives (not
    // 10k) — the flood never reaches the pair stage. Whether the two
    // unrelated rep texts collide on a band is signature luck; the
    // contract here is boundedness + hamming > 3 for unrelated text
    // (no emitted pair), not a specific candidate count.
    val got = ExtQueries.TestSql.simhashCollapsed(spark).collect()
    assert(got.isEmpty,
      s"unrelated rep texts must not pair at hamming<=3: ${got.mkString(",")}")
  }

  test("d14 collapsed embedding dedup: rep-level pair with member counts under a flood") {
    // extend the corpus with ONE near-but-not-exact duplicate of the
    // cool vector: the collapsed contract must emit exactly the
    // rep-level pair (cool-rep, near) with the cool group's full
    // member count — while the 10 raw cool vectors' C(10,2) pairs and
    // the 10k flood clique collapse away entirely
    val sp = spark; import sp.implicits._
    val coolVec = Array.fill(64)(1.0f)
    val nearVec = Array.fill(64)(1.0f); nearVec(63) = 0.5f
    val floodVec = Array.fill(64)(-1.0f)
    val vecs =
      (0L until 10L).map(i => (i, coolVec)) ++
        Seq((500L, nearVec)) ++
        (1000L until (1000L + Flood)).map(i => (i, floodVec))
    try {
      vecs.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
      val got = ExtQueries.TestSql.embeddingDedupCollapsed(spark).collect()
      assert(got.length == 1, got.mkString(";"))
      val r = got.head
      assert((r.getLong(0), r.getLong(1)) == ((0L, 500L)))
      assert(r.getDouble(2) > 0.95)
      assert((r.getLong(3), r.getLong(4)) == ((10L, 1L))) // ni, nj
    } finally {
      // restore the shared corpus for any later test
      ((0L until 10L).map(i => (i, coolVec)) ++
        (1000L until (1000L + Flood)).map(i => (i, floodVec)))
        .toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    }
  }

  test("d13 dup coverage: flood-immune by construction (no pair stage)") {
    // a corpus that is ~100% duplicated content: every doc's shingles
    // all appear in >= 2 docs, so every doc lands in the top decile —
    // and the query needs no hot-bucket cap to survive because it
    // never forms candidate pairs at all
    val sp = spark; import sp.implicits._
    val floodText = "the quick brown fox jumps over the lazy dog again and again"
    val plantedText = "distributed columnar analytics engines shred nested rows into typed column streams"
    val docs =
      Seq((1L, plantedText, "en"), (2L, plantedText, "en")) ++
        (1000L until (1000L + Flood)).map(i => (i, floodText, "en"))
    try {
      docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
      val got = ExtQueries.TestSql.dupCoverage(spark).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq(("en", 10L, (Flood + 2).toLong)), got.toString)
    } finally {
      docs.map { case (i, t, _) => (i, t) }
        .toDF("doc_id", "text").createOrReplaceTempView("documents")
    }
  }

  test("d15 dup-span: a 10k-dup flood stays bounded (no pair stage to explode)") {
    // EVERY shingle of a flooded doc is corpus-duplicated, so every doc's
    // span is its whole length — the worst case for the island windows —
    // yet there is no candidate pair stage anywhere, so the flood costs
    // one linear pass, not N^2/2 candidates. floodText is 12 words,
    // plantedText 11 — all 10,002 docs land in span bucket 1.
    val sp = spark; import sp.implicits._
    val floodText = "the quick brown fox jumps over the lazy dog again and again"
    val plantedText = "distributed columnar analytics engines shred nested rows into typed column streams"
    val docs =
      (Seq((1L, plantedText), (2L, plantedText)) ++
        (1000L until (1000L + Flood)).map(i => (i, floodText)))
        .map { case (i, t) => (i, t, "en") }
    try {
      docs.toDF("doc_id", "text", "lang").createOrReplaceTempView("documents")
      val got = ExtQueries.TestSql.dupSpan(spark).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == Seq(("en", 1L, (Flood + 2).toLong, 12L)), got.toString)
    } finally {
      docs.map { case (i, t, _) => (i, t) }
        .toDF("doc_id", "text").createOrReplaceTempView("documents")
    }
  }

  test("d16 semantic dedup: a 10k-identical-vector flood collapses to one rep") {
    // Exact collapse means the flood contributes ONE representative to
    // the within-cell pair stage (3 reps total -> 3 candidate pairs, not
    // ~50M): the near vector is dropped by its cool representative, the
    // anti-aligned flood rep pairs with nothing, and the member total
    // carries the full corpus.
    val sp = spark; import sp.implicits._
    val coolVec = Array.fill(64)(1.0f)
    val nearVec = Array.fill(64)(1.0f); nearVec(63) = 0.5f
    val floodVec = Array.fill(64)(-1.0f)
    val vecs =
      (0L until 10L).map(i => (i, coolVec, 0)) ++
        Seq((500L, nearVec, 0)) ++
        (1000L until (1000L + Flood)).map(i => (i, floodVec, 0))
    try {
      vecs.toDF("vec_id", "embedding", "label")
        .createOrReplaceTempView("embeddings")
      val got = ExtQueries.TestSql.semanticDedup(spark).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == Seq((0, 3L, 1L, (Flood + 11).toLong)), got.toString)
    } finally {
      // restore the shared fixture (cool + flood, no near, no label)
      vecs.filter(_._1 != 500L).map { case (i, v, _) => (i, v) }
        .toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    }
  }

  test("m05 collapsed image dedup: a replica flood never reaches the pair stage") {
    val sp = spark; import sp.implicits._
    // 10k copies of image A (doc 0's payload), 3 copies of its one-pixel
    // twin (doc 3: same group g=0, a perturbation that flips bits), one
    // far image from another gradient group. m04's raw contract would
    // band-join 10k-row hamming-0 cliques; the collapsed contract's rep
    // relation is 3 rows and the pair multiplicity carries the flood.
    val payloads = (
      (0L until Flood.toLong).map(i => (i, ExtQueries.TestSql.plantedImage(0L))) ++
        (20000L until 20003L).map(i => (i, ExtQueries.TestSql.plantedImage(3L))) ++
        Seq((30000L, ExtQueries.TestSql.plantedImage(7L * 5L)))
      ).toDF("doc_id", "payload")
    val got = ExtQueries.TestSql.imageDhashCollapsed(spark, payloads)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // exactly one rep pair: A-rep (doc 0, 10k members) x twin-rep
    // (doc 20000, 3 members) at the planted within-group hamming;
    // raw multiplicity = 10000 * 3. The far image pairs with nothing.
    assert(got.map(t => (t._2, t._3)) == List((1L, 30000L)),
      s"expected one rep pair carrying the flood: $got")
    assert(got.head._1 >= 1L && got.head._1 <= 3L)
  }

  test("v06 cap report: flooded ANN table drops are visible per hash table") {
    val cap = ExtQueries.TestSql.hotBucketCap
    val rows = spark.sql(ExtQueries.TestSql.annCapReport).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    rows.foreach { case (tbl, (nbits, nMulti, nDroppedBuckets, rowsDropped, maxBucket)) =>
      // 10010 vectors -> the corpus-scaled sizing rule lands on 8 bits
      assert(nbits == 8L, s"table $tbl nbits")
      // identical flood vectors share one bucket per table; identical
      // cool vectors share another (10 <= cap, kept)
      assert(nDroppedBuckets == 1L, s"table $tbl dropped buckets")
      assert(rowsDropped == Flood.toLong, s"table $tbl rows dropped")
      assert(maxBucket == Flood.toLong && maxBucket > cap, s"table $tbl max bucket")
      assert(nMulti == 2L, s"table $tbl multi buckets")
    }
  }
}
