package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native ports of the reference CLI tools.
  *
  * The reference implements these as single-process C++ programs; here
  * each is a DataFrame program, so the same invocation scales from one
  * file to a cluster (scan parallelism = chunks, sort = SortExec with
  * spilling — the reference's run-generation + k-way merge is exactly
  * what Tungsten's UnsafeExternalSorter does under `orderBy`).
  */
object CfTools {

  /** columnfile-cat (reference: tools/columnfile-cat.cc): scan -> AND of
    * per-column contains-filters -> projection -> TSV or columnfile out.
    *
    * @param filters  (column, pattern): keep rows where column's string
    *                 form contains pattern (cat's `--filter COL:PATTERN`,
    *                 columnfile-cat.cc:244-264)
    * @param select   column subset in output order (cat's `--format`)
    * @param compression output codec when writing columnfile
    *                 (cat's `--compression`, recompression path)
    */
  def cat(
      spark: SparkSession,
      inputs: Seq[String],
      filters: Seq[(String, String)] = Nil,
      select: Seq[String] = Nil,
      inputFormat: String = "columnfile"): DataFrame = {
    var df = spark.read.format(inputFormat).load(inputs: _*)
    filters.foreach { case (c, pattern) =>
      df = df.filter(col(c).cast("string").contains(pattern))
    }
    if (select.nonEmpty) df = df.select(select.map(col): _*)
    df
  }

  /** Write a cat result as TSV (cat's text output path) or columnfile
    * (recompress/concat path). `dictionary`/`bitpack` opt into the
    * engine's encoding extensions, so the ETL-copy tool doubles as a
    * re-encode pass (plain table in, dictionary+packed table out).
    */
  def writeCat(df: DataFrame, output: String, outputFormat: String,
               compression: String = "lz4",
               dictionary: Boolean = false,
               bitpack: Boolean = false): Unit = outputFormat match {
    case "text" | "tsv" =>
      df.write.mode("overwrite")
        .option("sep", "\t").option("header", "false").csv(output)
    case "columnfile" =>
      df.write.mode("overwrite").format("columnfile")
        .option("compression", compression)
        .option("dictionary", dictionary.toString)
        .option("bitpack", bitpack.toString)
        .save(output)
    case other =>
      throw new IllegalArgumentException(s"unknown output format: $other")
  }

  /** columnfile-sort (reference: tools/columnfile-sort.cc): whole-row
    * lexicographic sort, NULLS FIRST (std::optional `<` puts nullopt
    * before any value — columnfile-sort.cc:112). With no keys given,
    * sorts by all columns in index order, matching the reference's
    * column-0-then-column-1 row comparison. Multiple inputs are merged
    * (the `--merge` mode) because the scan unions them before the sort.
    */
  def sort(
      spark: SparkSession,
      inputs: Seq[String],
      keys: Seq[String] = Nil,
      inputFormat: String = "columnfile"): DataFrame = {
    val df = spark.read.format(inputFormat).load(inputs: _*)
    val sortCols: Seq[Column] =
      (if (keys.nonEmpty) keys else df.columns.toSeq).map(col(_).asc_nulls_first)
    df.orderBy(sortCols: _*)
  }

  /** `keys` (the sort's own key list; all columns when the sort ran
    * key-less) are stamped into the table's `_sort_order.json` so the
    * output is SELF-DESCRIBING: downstream merge consumers get the
    * scan's validated ordering report — and sort-free merge joins —
    * with no read option, exactly the reference economics where sorted
    * output is trusted by its own `--merge` (columnfile-sort.cc:337-342).
    * Stamp-capable keys only (stats-backed leaf columns); pass Nil to
    * skip stamping.
    */
  def writeSorted(df: DataFrame, output: String, compression: String = "lz4",
                  keys: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("columnfile")
      .option("compression", compression)
      // reference sort uses 128 MiB chunks (columnfile-sort.cc:34)
      .option("targetChunkBytes", (128L * 1024 * 1024).toString)
    (if (keys.nonEmpty) w.option("sortedBy", keys.mkString(","))
     else w).save(output)
  }

  /** Compaction: rewrite a table's many small files into
    * ceil(totalBytes / targetFileBytes) files with large chunks — the
    * standard operational pass after streaming/small-batch ingest (the
    * cluster-scale generalization of the reference cat tool's
    * concatenate-many-inputs-into-one job). Optionally sorts within
    * output files to restore clustering for stats pruning, or
    * Z-ORDERS on several columns (`zOrderBy`) so min/max chunk pruning
    * works on EVERY listed column — a linear sort clusters only its
    * leading column.
    */
  def compact(
      spark: SparkSession,
      input: String,
      output: String,
      targetFileBytes: Long = 1L << 30,
      sortWithinBy: Seq[String] = Nil,
      compression: String = "lz4",
      targetChunkBytes: Long = 16L * 1024 * 1024,
      zOrderBy: Seq[String] = Nil,
      dictionary: Boolean = false,
      bitpack: Boolean = false): Unit = {
    require(sortWithinBy.isEmpty || zOrderBy.isEmpty,
      "compact: choose sortWithinBy OR zOrderBy, not both")
    val conf = spark.sessionState.newHadoopConf()
    val totalBytes = graft.spark.ColumnFileDataSource
      .listDataFiles(conf, Seq(input)).map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val in = spark.read.format("columnfile").load(input)
    var df =
      if (zOrderBy.nonEmpty) {
        // range-partition + sort on the interleaved key: both global
        // file-level and chunk-level locality on every z-order column
        in.withColumn("__graft_z", zValue(zOrderBy))
          .repartitionByRange(nFiles, col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
      } else in.repartition(nFiles)
    if (sortWithinBy.nonEmpty)
      df = df.sortWithinPartitions(sortWithinBy.map(col): _*)
    // a sorted compaction knows exactly what order it wrote — stamp it
    // (stats-capable prefix) so consumers discover the order with no
    // read option; a Z-ORDER rewrite clusters but does not sort any
    // single column, so it makes no claim
    val stamp = sortWithinBy.takeWhile(c => graft.spark.ChunkStatsIndex
      .statsCapable(df.schema(c).dataType))
    val w = df.write.mode("overwrite").format("columnfile")
      .option("compression", compression)
      .option("targetChunkBytes", targetChunkBytes.toString)
      .option("dictionary", dictionary.toString)
      .option("bitpack", bitpack.toString)
    (if (stamp.nonEmpty) w.option("sortedBy", stamp.mkString(","))
     else w).save(output)
  }

  /** Z-value (Morton interleave) of several integer columns: bit j of
    * column c lands at position j*k + c, so chunks of the sorted output
    * are hyper-rectangles in key space and min/max stats prune on every
    * dimension. 62/k bits per column; intended for NON-NEGATIVE integer
    * keys (shift/offset negatives upstream). Codegen-friendly: a pure
    * shift/mask/or expression, no UDF.
    */
  private[graft] def zValue(cols: Seq[String]): org.apache.spark.sql.Column = {
    val k = cols.length
    require(k >= 2, "zOrderBy needs at least two columns")
    val bits = 62 / k
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      b <- 0 until bits
    } yield s"(((CAST(`$c` AS BIGINT) >> $b) & 1) << ${b * k + ci})"
    org.apache.spark.sql.functions.expr(terms.mkString("(", " | ", ")"))
  }

  /** Maintenance sweep for a streamed-into table: deletes in-progress
    * files left by crashed micro-batch attempts (dot-prefixed, invisible
    * to every reader — this reclaims their space), their sidecars, and
    * any orphaned stats sidecar whose data file is gone. Only files older
    * than `minAgeMs` are touched so a LIVE epoch's in-flight files
    * survive the sweep (a crashed attempt's files stop aging forward; a
    * running one's were written within the trigger interval).
    * Returns the number of files deleted.
    */
  def clean(spark: SparkSession, dir: String,
            minAgeMs: Long = 24L * 3600 * 1000): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return 0
    val now = System.currentTimeMillis()
    val statsSuffix = graft.spark.ChunkStatsIndex.Suffix
    val all = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    def collect(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory) { if (!st.getPath.getName.startsWith("_")) collect(st.getPath) }
        else all += st
      }
    collect(root)
    // Temps referenced by a streaming epoch INTENT marker are committed
    // data awaiting publish (the marker is the commit point) — a crashed
    // stream may resume and complete them, so the sweep must not touch
    // them at any age. Stale dot-prefixed .intent temp markers (crash
    // between marker write and rename) ARE swept.
    val epochsDir = new org.apache.hadoop.fs.Path(root, "_epochs")
    val protectedTemps = scala.collection.mutable.HashSet.empty[String]
    var deleted = 0
    def delAt(st: org.apache.hadoop.fs.FileStatus): Unit =
      if (now - st.getModificationTime >= minAgeMs && fs.delete(st.getPath, false))
        deleted += 1
    if (fs.exists(epochsDir)) fs.listStatus(epochsDir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".") && n.endsWith(".intent")) delAt(st)
      else if (!st.isDirectory) {
        val in = fs.open(st.getPath)
        val body = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        body.split('\n').filter(_.nonEmpty).foreach { line =>
          val i = line.indexOf('\t')
          if (i > 0) {
            val tmp = new org.apache.hadoop.fs.Path(line.substring(0, i))
            protectedTemps += tmp.toUri.getPath
            protectedTemps += new org.apache.hadoop.fs.Path(tmp.getParent,
              "." + tmp.getName + statsSuffix).toUri.getPath
          }
        }
      }
    }
    def del(st: org.apache.hadoop.fs.FileStatus): Unit =
      if (!protectedTemps(st.getPath.toUri.getPath)) delAt(st)
    // pass 1: crashed attempts' in-progress data files (dot-prefixed .cf)
    all.filter { st =>
      val n = st.getPath.getName
      n.startsWith(".") &&
        n.endsWith(graft.spark.ColumnFileDataSource.FileExtension)
    }.foreach(del)
    // pass 2: stats sidecars whose data file is gone (incl. the ones
    // orphaned by pass 1 and by out-of-band data-file deletion)
    all.filter { st =>
      val n = st.getPath.getName
      n.startsWith(".") && n.endsWith(statsSuffix) && {
        val dataName = n.stripPrefix(".").stripSuffix(statsSuffix)
        !fs.exists(new org.apache.hadoop.fs.Path(st.getPath.getParent, dataName))
      }
    }.foreach(del)
    deleted
  }

  /** CLI: cat [--filter C:P]... [--select a,b] [--compression c]
    *          [--output-format text|columnfile] --output DIR INPUT...
    *      sort [--keys a,b] [--compression c] --output DIR INPUT...
    */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList) finally spark.stop()
  }

  private def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "cat" :: rest =>
      val (opts, inputs) = parse(rest)
      val df = cat(spark, inputs,
        filters = opts.collect { case ("filter", v) =>
          val Array(c, p) = v.split(":", 2); (c, p) },
        select = opts.collect { case ("select", v) => v.split(",").toSeq }.flatten)
      writeCat(df,
        opts.collectFirst { case ("output", v) => v }
          .getOrElse(throw new IllegalArgumentException("--output required")),
        opts.collectFirst { case ("output-format", v) => v }.getOrElse("columnfile"),
        opts.collectFirst { case ("compression", v) => v }.getOrElse("lz4"))
    case "sort" :: rest =>
      val (opts, inputs) = parse(rest)
      val keys = opts.collect { case ("keys", v) => v.split(",").toSeq }.flatten
      val df = sort(spark, inputs, keys)
      // stamp the sort's effective key list (all columns when key-less),
      // cut to the stats-capable prefix a reader could ever validate
      val effKeys = (if (keys.nonEmpty) keys else df.columns.toSeq)
        .takeWhile(c => graft.spark.ChunkStatsIndex
          .statsCapable(df.schema(c).dataType))
      writeSorted(df,
        opts.collectFirst { case ("output", v) => v }
          .getOrElse(throw new IllegalArgumentException("--output required")),
        opts.collectFirst { case ("compression", v) => v }.getOrElse("lz4"),
        keys = effKeys)
    case other =>
      throw new IllegalArgumentException(s"usage: cat|sort ... (got $other)")
  }

  private def parse(args: List[String]): (List[(String, String)], List[String]) =
    args match {
      case opt :: value :: rest if opt.startsWith("--") =>
        val (o, i) = parse(rest)
        ((opt.stripPrefix("--"), value) :: o, i)
      case path :: rest =>
        val (o, i) = parse(rest)
        (o, path :: i)
      case Nil => (Nil, Nil)
    }
}
