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
    val done = new java.io.File(outDir, "_SUCCESS")
    if (done.exists()) return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def raw(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    val bases: Map[String, Long] = domainSource.map { case (dom, (t, c)) =>
      dom -> (raw(t).agg(max(col(c))).head.getAs[Number](0).longValue + 1L)
    }
    // onlyTables limits a high-replica scale-step (e.g. 100x documents)
    // to the tables its query subset reads — a 100x lineitem write the
    // run never scans is just wasted build time.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .filter(t => onlyTables.forall(_.contains(t)))
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
    done.createNewFile()
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
