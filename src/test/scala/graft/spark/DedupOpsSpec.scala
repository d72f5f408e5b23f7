package graft.spark

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("dedup-ops-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    Dedup.connectedComponents(pairs.toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain-shaped cluster collapses to one component (d08's 1-hop would split it)") {
    // A-B, B-C, C-D: under min-over-direct-neighbors, D's group key is C,
    // not A — label propagation must iterate the chain to a fixed point
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("long chain, reversed edge order, converges to the global min") {
    val chain = (1L until 12L).map(i => (i + 1, i)) // 12-11, 11-10, ... 2-1
    val got = cc(chain)
    assert(got.keySet == (1L to 12L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("disjoint cliques and an empty graph") {
    val got = cc(Seq((5L, 6L), (6L, 7L), (5L, 7L), (20L, 21L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 20L -> 20L, 21L -> 20L))
    assert(cc(Seq.empty).isEmpty)
  }

  test("extreme hashed ids converge exactly (no sum-based aliasing)") {
    // Convergence is a changed-label check, not a Long label-sum compare
    // that could wrap at hash-range ids. Mix of Long.MaxValue-adjacent,
    // negative, and zero ids in one chain plus a disjoint pair.
    val a = Long.MaxValue; val b = Long.MaxValue - 1
    val got = cc(Seq((a, b), (b, 0L), (0L, Long.MinValue + 1),
      (-42L, -7L)))
    assert(got == Map(
      a -> (Long.MinValue + 1), b -> (Long.MinValue + 1),
      0L -> (Long.MinValue + 1), (Long.MinValue + 1) -> (Long.MinValue + 1),
      -42L -> -42L, -7L -> -42L))
  }
}
