package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Pre-gate sanity sweep (VERDICT r9 #5): register every view and
    * function ONCE and probe each with a 1-row read before any query
    * runs. A drifted table vintage or broken registration then shows up
    * as one loud, named `[preflight]` line at the top of the log —
    * instead of 20 downstream query failures with misleading messages
    * (the round-8 incident shape). Diagnostic only: queries still run,
    * so a single bad table costs exactly the queries that read it.
    */
  private def preflight(spark: SparkSession, sfDir: String): Unit = {
    try graft.queries.Tables.registerAll(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[preflight] registerAll FAILED: ${e.getMessage}") }
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "documents", "embeddings", "events")
    var bad = 0
    tables.foreach { n =>
      try {
        if (spark.catalog.tableExists(n)) { spark.table(n).limit(1).collect(); () }
        else { bad += 1
          System.err.println(s"[preflight] view MISSING: $n") }
      } catch { case e: Throwable => bad += 1
        System.err.println(s"[preflight] view UNREADABLE: $n: ${e.getMessage}") }
    }
    Seq("graft_polyhash('x')", "graft_simhash31(array(1L))",
      "graft_minhash_sig(array(1L))", "graft_shingle_hashes('a b c d e f')",
      "graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))",
      "graft_idot(array(1), array(2))")
      .foreach { probe =>
        try { spark.sql(s"SELECT $probe AS v").collect(); () }
        catch { case e: Throwable => bad += 1
          System.err.println(s"[preflight] function probe FAILED: $probe: ${e.getMessage}") }
      }
    System.err.println(
      if (bad == 0) s"[preflight] OK: ${tables.size} views + functions healthy"
      else s"[preflight] $bad problem(s) — see lines above")
  }

  def main(args: Array[String]): Unit = {
    // Tooling mode: dump the inventory's query names (one per line) and
    // exit — used by scripts/fuzz_corpus_verify.py to expand family
    // prefixes without starting a Spark session.
    if (args.length >= 2 && args(0) == "--dump-names") {
      val out = new java.io.PrintWriter(args(1))
      try SparkEntry.queries.keys.toSeq.sorted.foreach(out.println)
      finally out.close()
      return
    }
    val (sfDir, outDir) = (args(0), args(1))
    // Optional local-iteration filter: comma-separated query names (the
    // driver never sets it, so driver runs always cover the full
    // inventory — and oracle_sql.json is filtered identically, so the
    // DuckDB compare never reports an unrun query as missing).
    val only: Option[Set[String]] =
      sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine-level session settings (SPJ, codegen cache, extensions)
    // come from GraftSessionDefaults — identical planner settings for
    // every query regardless of run order (q37 previously flipped SPJ
    // confs mid-run), and the same session shape as Bench and any
    // production SparkEntry consumer.
    val spark = GraftSessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Clear stale results: a failed query must not leave a previous
    // run's output in place to be mistaken for this run's.
    val outRoot = new java.io.File(outDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (outRoot.exists()) rm(outRoot)
    outRoot.mkdirs()
    preflight(spark, sfDir)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
