package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format head-to-head: the same queries over the same data stored as
  * parquet (Spark's native gold standard) vs columnfile (lz4) vs
  * columnfile with dictionary encoding. BASELINE.md records that the
  * reference publishes no numbers, so Spark-parquet is the meaningful
  * single-node throughput anchor for the scan path.
  *
  * Prints one JSON line: per-format per-query seconds (min of two
  * passes after a warm-up) plus on-disk bytes.
  */
object BenchFormats {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.newSession(cpus)
    import org.apache.spark.sql.functions._

    val base = s"${sys.props("java.io.tmpdir")}/graft_fmt_bench/${Integer.toHexString(sfDir.hashCode)}"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def ensure(path: String)(write: => Unit): Unit =
      if (!new java.io.File(path, "_SUCCESS").exists()) write
    val pq = s"$base/parquet"
    ensure(pq) { li.write.mode("overwrite").parquet(pq) }
    val cf = s"$base/cf"
    ensure(cf) { li.write.format("columnfile").mode("overwrite").save(cf) }
    val cfDict = s"$base/cf_dict"
    ensure(cfDict) { li.write.format("columnfile")
      .option("dictionary", "true").mode("overwrite").save(cfDict) }
    // dictionary + bit-packed numerics: the full-encoding configuration
    val cfPacked = s"$base/cf_packed"
    ensure(cfPacked) { li.write.format("columnfile")
      .option("dictionary", "true").option("bitpack", "true")
      .mode("overwrite").save(cfPacked) }
    // full encodings + a WRITE-VERIFIED sort stamp: prices what the
    // self-describing order costs a reader that never exploits it —
    // every scan of a stamped table runs stamp discovery + chunk-stats
    // validation at planning (memoized per scan since r20, and carried
    // by the manifest for useManifest readers)
    val cfStamped = s"$base/cf_stamped"
    ensure(cfStamped) { li.orderBy("l_orderkey")
      .write.format("columnfile")
      .option("dictionary", "true").option("bitpack", "true")
      .option("sortedBy", "l_orderkey")
      .mode("overwrite").save(cfStamped) }

    def table(path: String): DataFrame =
      if (path == pq) spark.read.parquet(path)
      else spark.read.format("columnfile").load(path)

    // the scan shapes that exercise a format: full-width agg, selective
    // filter, narrow projection, filter on a categorical column
    val queries: Seq[(String, DataFrame => Long)] = Seq(
      // reduce to one scalar on the executors (no driver-side row
      // materialization) while still forcing every aggregate to compute —
      // a bare .count() would let ColumnPruning drop the sum/avg
      "full_agg" -> (df => df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("c"), sum("l_quantity").as("s"),
          avg("l_extendedprice").as("a"))
        .select(count(xxhash64(col("c"), col("s"), col("a"))))
        .head().getLong(0)),
      "selective_filter" -> (df =>
        df.filter(col("l_quantity") > 49.5).count()),
      "narrow_projection" -> (df =>
        df.select("l_orderkey", "l_quantity").filter(col("l_orderkey") % 1000 === 0)
          .count()),
      "categorical_filter" -> (df =>
        df.filter(col("l_returnflag") === "R").count()))

    val formats = Seq("parquet" -> pq, "cf_lz4" -> cf, "cf_dict" -> cfDict,
      "cf_packed" -> cfPacked, "cf_stamped" -> cfStamped)
    // warm-up
    formats.foreach { case (_, p) => queries.foreach(q => q._2(table(p))) }
    def pass(): Map[(String, String), Double] =
      (for ((fname, p) <- formats; (qname, q) <- queries) yield {
        val t0 = System.nanoTime()
        q(table(p))
        (fname, qname) -> (System.nanoTime() - t0) / 1e9
      }).toMap
    val (p1, p2) = (pass(), pass())
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.map(walk).sum
        else f.length()
      walk(new java.io.File(p))
    }
    val body = formats.map { case (fname, p) =>
      val qs = queries.map { case (qname, _) =>
        val t = math.min(p1((fname, qname)), p2((fname, qname)))
        s""""$qname":$t"""
      }.mkString("{", ",", "}")
      s""""$fname":{"bytes":${dirBytes(p)},"queries":$qs}"""
    }.mkString("{", ",", "}")

    // Time-series table head-to-head: events is time-sorted with
    // sequential ids — the shape the zigzag delta-FOR mode (code 11)
    // targets (lineitem above is shuffled, so delta correctly bails
    // there). Sizes are the durable signal; one range-scan each.
    val ev = graft.queries.Tables.events(spark, sfDir)
    val evPq = s"$base/ev_parquet"
    ensure(evPq) { ev.write.mode("overwrite").parquet(evPq) }
    val evCf = s"$base/ev_cf_packed"
    ensure(evCf) { ev.write.format("columnfile")
      .option("dictionary", "true").option("bitpack", "true")
      .mode("overwrite").save(evCf) }
    def evTable(p: String): DataFrame =
      if (p == evPq) spark.read.parquet(p)
      else spark.read.format("columnfile").load(p)
    def evScan(df: DataFrame): Long =
      df.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value").count()
    val evFormats = Seq("parquet" -> evPq, "cf_packed" -> evCf)
    evFormats.foreach { case (_, p) => evScan(evTable(p)) }
    val evBody = evFormats.map { case (fname, p) =>
      val t = {
        val a = { val t0 = System.nanoTime(); evScan(evTable(p)); (System.nanoTime() - t0) / 1e9 }
        val b = { val t0 = System.nanoTime(); evScan(evTable(p)); (System.nanoTime() - t0) / 1e9 }
        math.min(a, b)
      }
      s""""$fname":{"bytes":${dirBytes(p)},"queries":{"typed_scan":$t}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"format_bench","sf":"$sfDir","formats":$body,"events_formats":$evBody}""")
    spark.stop()
  }
}
