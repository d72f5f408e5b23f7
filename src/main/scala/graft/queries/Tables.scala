package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access for the query inventory.
  *
  * `t` reads the driver's parquet; `viaCF` routes a table through our
  * columnfile format (write once to a local cache, then read through the
  * DataSource V2 connector) so the storage-parity queries actually
  * exercise the engine's own scan/sink path end to end.
  */
object Tables {

  import org.apache.spark.sql.types._

  /** Canonical column types per table, pinned to the shipped vintage the
    * query inventory (and its DuckDB oracle twins) were hash-matched
    * against. Round 8 lost ~20 queries to ONE drifted column
    * (`events.ts`); this generalizes that fix to every table: a future
    * vintage that widens an int, turns a DOUBLE price into DECIMAL, ships
    * `embeddings.embedding` as list<double>, or moves a date column
    * between DATE/TIMESTAMP/TIMESTAMP_NTZ is cast back to the canonical
    * type at load, so every downstream query sees one stable schema.
    * On the current vintage every rule is a no-op.
    */
  private val canonical: Map[String, Seq[(String, DataType)]] = Map(
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      // shipped vintage is TIMESTAMP_NTZ (isAdjustedToUTC=false) and the
      // inventory hash-matched against it — pin NTZ, not TimestampType
      "l_shipdate" -> TimestampNTZType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))

  /** Cast drifted columns back to their canonical type. One special
    * rule beyond plain CAST: a LONG column whose canonical type is a
    * timestamp is the TIMESTAMP(NANOS) parquet vintage (Spark 4 reads
    * it as long only under the `nanosAsLong` legacy conf) — epoch-nanos,
    * not epoch-seconds, so it converts via `timestamp_micros(v/1000)`.
    * Comparison is on `catalogString` (ignores nullability flags).
    */
  private def coerce(name: String, df: DataFrame): DataFrame =
    canonical.get(name).fold(df) { fields =>
      fields.foldLeft(df) { case (d, (cname, target)) =>
        if (!d.columns.contains(cname)) d
        else d.schema(cname).dataType match {
          case actual if actual.catalogString == target.catalogString => d
          case LongType
              if target == TimestampType || target == TimestampNTZType =>
            d.withColumn(cname,
              expr(s"timestamp_micros($cname div 1000)").cast(target))
          case _ => d.withColumn(cname, col(cname).cast(target))
        }
      }
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Set BEFORE the read: a TIMESTAMP(NANOS) vintage throws without it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    coerce(name, spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** events with `ts` normalized to session-TZ TimestampType regardless
    * of shipped vintage (nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP) —
    * the general canonical-schema path via [[t]].
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")

  /** Cache-format version: bump when the on-disk format or the writer
    * changes so stale caches from older code can't poison results.
    */
  // v4: stream fixtures shifted off epoch 0 (ts = doc_id + 1 s) — a
  // row at exactly the initial watermark is dropped by stateful ops
  // v5: ivfCommonCtes gained the explicit 64-centroid model cap —
  // materialized IVF/PQ indexes built before the cap carry a
  // (potentially) different coarse model; also retires pre-_COMPLETE
  // q66 delta dirs gated only by the sink's per-epoch _SUCCESS
  private[queries] val CacheVersion = "v6"

  // per-dir content stamp, memoized: (name, length, mtime) over the
  // dir's parquet files — RECURSIVE, because a Spark-written table is a
  // *directory* whose length is meaningless and whose mtime has 1-second
  // granularity; the part files underneath carry task-UUID names, so any
  // rewrite (even within the same second) changes the stamp. The cache
  // key changes whenever the source data does — a regenerated testdata
  // dir at the SAME path (the round-8/9 incident class) can never be
  // served stale cf copies from a persistent temp dir.
  private val dirStamps = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dirStamp(dir: String): String =
    dirStamps.computeIfAbsent(dir, d => {
      def walk(f: java.io.File, acc: Long): Long = {
        var x = acc
        for (v <- Seq(f.getName.hashCode.toLong, f.length, f.lastModified))
          x = (x ^ v) * 1099511628211L
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty)
            .sortBy(_.getName).foldLeft(x)((a, c) => walk(c, a))
        else x
      }
      val files = Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val stamp = java.lang.Long.toHexString(
        files.foldLeft(1469598103934665603L)((a, f) => walk(f, a)))
      pruneStaleCaches(d, stamp)
      stamp
    })

  /** Content-keyed cache dirs would otherwise accumulate one generation
    * per data rewrite under java.io.tmpdir forever; when a new stamp is
    * first computed for a dir, drop that dir's older generations. (A
    * concurrent JVM still reading an old generation re-materializes on
    * its next cache miss — the cache is best-effort by design.)
    */
  private def pruneStaleCaches(dir: String, stamp: String): Unit = {
    val prefix = java.lang.Integer.toHexString(dir.hashCode) + "-"
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_cf_cache/$CacheVersion")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) && f.getName != prefix + stamp)
      .foreach(rm)
  }

  /** Test hook: drop the memoized stamp so a rewrite within one JVM is
    * observed (real runs get a fresh JVM per round).
    */
  private[queries] def forgetDirStamp(dir: String): Unit = {
    dirStamps.remove(dir); ()
  }

  /** Recursive delete (no-op on a missing path) — cache-dir maintenance
    * for query paths that must rebuild a partial or stale output.
    */
  def rmrf(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  // ---- exactly-once foreachBatch output protocol (q63/q64/q65) ----
  // Each micro-batch OVERWRITES its own batchId-keyed dir under `out`
  // (idempotent under replay/retry), completion is a `_COMPLETE` marker
  // written only after the stream drains, and a missing marker means
  // the output is partial or absent — it is rebuilt, never resumed
  // into (a half-written dir + stale checkpoint cannot be resumed into
  // deterministically). One implementation so a protocol fix cannot
  // silently miss a sink.

  /** True when `out` carries the post-drain completion marker. */
  def batchOutputComplete(out: String): Boolean =
    new java.io.File(out, "_COMPLETE").exists()

  /** Clear a partial/absent batch output and its checkpoint. */
  def resetBatchOutput(out: String): Unit = {
    rmrf(out); rmrf(out + "_ckpt")
  }

  /** Mark a drained batch output complete (an empty drain writes no
    * batch dir, so the parent may not exist yet — create it).
    */
  def markBatchOutputComplete(out: String): Unit = {
    new java.io.File(out).mkdirs()
    new java.io.File(out, "_COMPLETE").createNewFile()
    ()
  }

  /** Union-scan every batchId-keyed dir under `out` (the q24 multi-path
    * scan). `ddl` is the record schema, used to produce a typed EMPTY
    * relation when the drain wrote no batches (zero-path load throws).
    */
  def loadBatchDirs(spark: SparkSession, out: String,
      ddl: String): DataFrame = {
    val dirs = Option(new java.io.File(out).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getPath).sorted
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    else spark.read.format("columnfile").load(dirs.toIndexedSeq: _*)
  }

  /** Cache location for a columnfile copy of `dir`'s `name` table. */
  def cachePath(dir: String, name: String): String = {
    val key = java.lang.Integer.toHexString(dir.hashCode) + "-" + dirStamp(dir)
    s"${sys.props("java.io.tmpdir")}/graft_cf_cache/$CacheVersion/$key/$name"
  }

  /** Dimension-style tables opt OUT of runtime (dynamic) filtering on
    * their cf scans: a runtime filter INTO a dimension is keyed by the
    * fact side, which is never broadcast, so Spark's speculative DPP
    * degrades to `dynamicpruningexpression(true)` at execution (a warning
    * per run, zero pruning) — and per ColumnFileScan.filterAttributes,
    * the rewrite can also defeat `sameResult` broadcast reuse for the
    * DPP that matters on the fact side. Facts keep runtime filtering.
    */
  private val dimensionTables =
    Set("customer", "supplier", "nation", "region", "part")

  /** Route a table through the columnfile format (cached per dir/codec). */
  def viaCF(spark: SparkSession, dir: String, name: String,
            compression: String = "lz4"): DataFrame = {
    val out = cachePath(dir, s"$name-$compression")
    val done = new java.io.File(out, "_SUCCESS")
    if (!done.exists()) {
      t(spark, dir, name).write.format("columnfile")
        .option("compression", compression).mode("overwrite").save(out)
    }
    val reader = spark.read.format("columnfile")
    if (dimensionTables(name)) reader.option("runtimeFiltering", "false")
    reader.load(out)
  }

  // last-registered dir per session: views are session-global, so a dir
  // switch must re-register (keying by (session, dir) would wrongly skip
  // after an A -> B -> A sequence). Weak keys: stopped sessions must not
  // be pinned by this cache in long-lived services.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Register the standard views used by the shared-SQL queries, plus
    * the native text-hash functions (graft_*). Idempotent per
    * (session, dir): repeated calls (one per inventory query) skip the
    * re-listing/re-registration.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) == dir) return
    // Functions first: they depend on nothing on disk, so a data problem
    // in one table can never leave the session without graft_* functions.
    graft.functions.TextHashFunctions.register(
      spark.sessionState.functionRegistry)
    graft.functions.VectorFunctions.register(
      spark.sessionState.functionRegistry)
    // Tolerate partial dirs: a scale-step build (BenchScale with a table
    // subset) materializes only the tables its query subset reads;
    // registering a missing parquet would throw and poison the
    // idempotence cache above for every later query in the session.
    def has(n: String) = new java.io.File(s"$dir/$n.parquet").exists()
    Seq("lineitem", "orders", "customer", "part", "supplier",
      "nation", "region", "documents", "embeddings")
      .filter(has)
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    if (has("events")) events(spark, dir).createOrReplaceTempView("events")
    // Record success only AFTER every view registered: a throw above must
    // leave the cache unset so the next call retries instead of running
    // the rest of the session against a half-registered catalog.
    registered.put(spark, dir)
    ()
  }

  /** Register columnfile-backed views (cf_<name>). */
  def registerCF(spark: SparkSession, dir: String, names: Seq[String],
                 compression: String = "lz4"): Unit =
    names.foreach(n =>
      viaCF(spark, dir, n, compression).createOrReplaceTempView(s"cf_$n"))
}
