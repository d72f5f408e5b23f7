package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock twin of d26's Pareto surface: times d03's PRODUCTION
  * pair pipeline (signature → band explode → hot-bucket cap → pair
  * self-join → Jaccard verify) at each band geometry (2×8, 4×4, 8×2 —
  * d22/d26's aligned splits), plus same-run reference rows (d03
  * itself, the 4×4 production query through its own code path, and
  * d05, the simhash family's pair query) so readings survive box
  * drift. Deliberately a BENCH artifact, not an oracle query: d26
  * pins the candidate-COUNT cost columns under the hash gate
  * (deterministic); wall-clock is not deterministic, so it lands in
  * BENCH_PARETO_DEDUP.json.
  *
  * The shared hash-set/signature materializations are charged to an
  * untimed warm-up (they are geometry-invariant — one signature pass
  * serves every geometry, d22's scale shape); each timed cell drops
  * its geometry's cached band relation first (`freshExplode`) and so
  * pays its own band explode, cap window, and pair join — exactly
  * the marginal cost of choosing that geometry.
  */
object BenchParetoDedup {

  private val Bands = Seq(2, 4, 8)

  private def timeMin2(f: () => Unit): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      f()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def run(spark: SparkSession, sfDir: String): String = {
    import graft.queries.ExtQueries
    graft.queries.Tables.registerAll(spark, sfDir)
    // untimed warm-up of every timed shape (hs/sig caches, codegen)
    val refs = Seq("d03_dedup_minhash_lsh", "d05_dedup_simhash_pairs")
    Bands.foreach(b => ExtQueries.lshGeomPairsDF(spark, b).count())
    refs.foreach(r => SparkEntry.queries(r)(spark, sfDir).count())
    val cells = Bands.map { b =>
      s"bands$b" -> timeMin2(() =>
        { ExtQueries.lshGeomPairsDF(spark, b, freshExplode = true)
            .count(); () })
    }
    val refRows = refs.map { r =>
      r -> timeMin2(() => { SparkEntry.queries(r)(spark, sfDir).count(); () })
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def obj(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    s"""{"metric":"pareto_dedup_wall","unit":"sec","cells":${obj(cells)},""" +
      s""""ref":${obj(refRows)},"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.newSession(cpus)
    val json = run(spark, sfDir)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)); ()
    }
    println(json)
    spark.stop()
  }
}
