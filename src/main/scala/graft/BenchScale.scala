package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-up benchmark: derives a ~sf1 dataset (10x sf0.1 — 6M lineitem
  * rows) from the driver-provided parquet by unioning key-shifted
  * replicas, then times the SAME inventory harness as [[Bench]] on it.
  *
  * Why: at sf0.1 on local[32] most queries finish in <0.5 s — too fast
  * to surface shuffle/spill behavior; regressions that only appear when
  * partitions carry real volume (exchange sizing, in-bucket candidate
  * growth, CC round counts) become visible here. A separate main keeps
  * the driver's Bench contract (one sf, one JSON line) untouched.
  *
  * Key shifting preserves join semantics: every foreign-key domain
  * (orderkey, custkey, partkey, suppkey, doc, vec, event, user) shifts
  * by `replica x (domainMax+1)`, so replica joins line up exactly and
  * key collisions across replicas are impossible. Dimension tables
  * (nation/region) and all value columns are kept as-is; event
  * timestamps too (10x the events per window — the realistic shape).
  */
object BenchScale {

  /** (table, shifted key columns by domain). */
  private val keyCols: Map[String, Seq[(String, String)]] = Map(
    "lineitem" -> Seq("l_orderkey" -> "order", "l_partkey" -> "part",
      "l_suppkey" -> "supp"),
    "orders" -> Seq("o_orderkey" -> "order", "o_custkey" -> "cust"),
    "customer" -> Seq("c_custkey" -> "cust"),
    "part" -> Seq("p_partkey" -> "part"),
    "supplier" -> Seq("s_suppkey" -> "supp"),
    "documents" -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"),
    "events" -> Seq("event_id" -> "event", "user_id" -> "user"))

  private val domainSource: Map[String, (String, String)] = Map(
    "order" -> ("orders", "o_orderkey"), "cust" -> ("customer", "c_custkey"),
    "part" -> ("part", "p_partkey"), "supp" -> ("supplier", "s_suppkey"),
    "doc" -> ("documents", "doc_id"), "vec" -> ("embeddings", "vec_id"),
    "event" -> ("events", "event_id"), "user" -> ("events", "user_id"))

  def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
      replicas: Int, onlyTables: Option[Set[String]] = None): Unit = {
    val allTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // onlyTables limits a high-replica scale-step (e.g. 100x documents)
    // to the tables its query subset reads — a 100x lineitem write the
    // run never scans is just wasted build time.
    val tables = allTables.filter(t => onlyTables.forall(_.contains(t)))
    // The done marker records WHICH tables the build materialized: a
    // partial (subset) build must not satisfy a later request for more
    // tables — reusing it would hand every missing-table query a
    // confusing failure instead of data (bitten once; see ROUND9.md).
    val done = new java.io.File(outDir, "_SUCCESS")
    if (done.exists()) {
      val built = new String(java.nio.file.Files.readAllBytes(done.toPath),
        java.nio.charset.StandardCharsets.UTF_8).split(",").filter(_.nonEmpty).toSet
      if (tables.forall(built.contains)) return
      if (built.isEmpty) {
        // Legacy empty marker (pre-table-list builds used createNewFile):
        // its table set is unknown, so rebuild instead of erroring —
        // writes below are mode("overwrite") per table, and the marker is
        // rewritten with the real list on completion.
        done.delete()
        ()
      } else throw new IllegalStateException(
        s"$outDir was built with tables [${built.toSeq.sorted.mkString(",")}] " +
          s"but this run needs [${tables.mkString(",")}]; " +
          "use a different SPARK_GRAFT_SCALED_DIR or delete the old build")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def raw(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    val bases: Map[String, Long] = domainSource.map { case (dom, (t, c)) =>
      dom -> (raw(t).agg(max(col(c))).head.getAs[Number](0).longValue + 1L)
    }
    tables.foreach { name =>
      val df = raw(name)
      val shifts = keyCols.getOrElse(name, Seq.empty)
      val out =
        if (shifts.isEmpty) df // dimensions: one copy
        else (0 until replicas).map { k =>
          shifts.foldLeft(df) { case (d, (c, dom)) =>
            // add in the column's own type: schema must not widen
            d.withColumn(c, col(c) + lit(k * bases(dom)).cast(d.schema(c).dataType))
          }
        }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    java.nio.file.Files.write(done.toPath, tables.mkString(",")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR",
      s"${sys.props("java.io.tmpdir")}/graft_scaled_${replicas}x")
    val onlyTables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).toSet)
    val spark = Bench.newSession(cpus)
    buildScaled(spark, srcDir, outDir, replicas, onlyTables)
    val json = Bench.toJson(Bench.timeInventory(spark, outDir),
      s"$outDir (${replicas}x $srcDir)")
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)); ()
    }
    println(json)
    spark.stop()
  }
}
