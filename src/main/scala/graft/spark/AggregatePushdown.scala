package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expression => VExpr, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** COUNT / COUNT(col) / MIN / MAX answered entirely from the chunk-stats
  * sidecars at planning time — no data file is opened. `SELECT count(*)
  * FROM cf_table` is O(stats sidecar bytes) regardless of table size:
  * the Parquet-metadata-only-query analog for our format.
  *
  * Pushed only when: no filters, no GROUP BY, every file has a stats
  * sidecar aligned with its chunks, and (for MIN/MAX) the column carries
  * range stats in every chunk where it has non-null values. Anything
  * else falls back to the normal scan — `pushAggregation` does the full
  * feasibility check (reading the sidecars) before committing.
  */
object AggregatePushdown {

  final case class Result(schema: StructType, rows: Seq[Seq[Any]])

  /** Try to answer `agg` from stats; None = not answerable. */
  def tryCompute(
      agg: Aggregation,
      tableSchema: StructType,
      conf: Configuration,
      paths: Seq[String],
      useManifest: Boolean = false): Option[Result] = {
    if (agg.groupByExpressions().nonEmpty) return None
    val leaves = CellCodec.flatten(tableSchema)
    val leafIdx = leaves.zipWithIndex.map { case (l, i) => (l.name, i) }.toMap

    def fieldOf(e: VExpr): Option[(Int, DataType)] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        leafIdx.get(f.fieldNames()(0)).map(i => (i, leaves(i).dataType))
      case _ => None
    }

    // Parse the aggregate list first — cheap rejection before I/O.
    sealed trait Spec
    case object CS extends Spec
    final case class C(col: Int) extends Spec
    final case class MinS(col: Int, dt: DataType) extends Spec
    final case class MaxS(col: Int, dt: DataType) extends Spec
    final case class SumS(col: Int) extends Spec
    val specs: Array[Option[(Spec, StructField)]] =
      agg.aggregateExpressions().map {
        case _: CountStar => Some((CS, StructField("count(*)", LongType, nullable = false)))
        case c: Count if !c.isDistinct =>
          fieldOf(c.column()).map { case (i, _) =>
            (C(i), StructField(s"count", LongType, nullable = false)) }
        case m: Min =>
          fieldOf(m.column()).collect { case (i, dt) if statsCapable(dt) =>
            (MinS(i, dt), StructField("min", dt, nullable = true)) }
        case m: Max =>
          fieldOf(m.column()).collect { case (i, dt) if statsCapable(dt) =>
            (MaxS(i, dt), StructField("max", dt, nullable = true)) }
        case s: Sum if !s.isDistinct =>
          fieldOf(s.column()).collect { case (i, dt) if sumCapable(dt) =>
            (SumS(i), StructField("sum", LongType, nullable = true)) }
        case _ => None
      }
    if (specs.exists(_.isEmpty)) return None
    val parsed = specs.map(_.get)

    // Load stats for every file; every chunk must be covered. Sidecars
    // that record chunk offsets + a matching file length are trusted
    // without opening the data file (the aggregate then costs one small
    // sidecar read per file); legacy sidecars are verified against a
    // header walk. Parallel across files.
    val files = ColumnFileDataSource
      .listDataFilesWithRoots(conf, paths, useManifest).map(_._2)
    val perFile: Seq[Option[Seq[ChunkStatsIndex.ChunkStats]]] =
      ColumnFileDataSource.mapFilesParallel(files) { st =>
        ChunkStatsIndex.readWithLen(conf, st.getPath) match {
          case Some((len, ss)) if len == st.getLen &&
              ss.forall(c => c.off >= 0 && c.bytes >= 0) =>
            Some(ss)
          case Some((_, ss)) =>
            val in = new HadoopSeekableInput(
              st.getPath.getFileSystem(conf), st.getPath, st.getLen)
            val chunks =
              try graft.format.ColumnFileReader.scanChunks(in) finally in.close()
            if (ss.length == chunks.length) Some(ss) else None
          case None => None // missing stats: no pushdown
        }
      }
    if (perFile.exists(_.isEmpty)) return None
    val allStats = perFile.flatten.flatten

    val totalRows = allStats.iterator.map(_.rows).sum
    val values: Seq[Any] = parsed.toSeq.map {
      case (CS, _) => totalRows
      case (C(i), _) =>
        // Our writer records an entry for every column that was touched in
        // a chunk (presence OR nulls), so a missing entry in a non-empty
        // chunk means either the column was entirely absent there (ragged
        // rows — reads back as all NULL) or the sidecar came from a
        // foreign writer with weaker guarantees. Either way we cannot
        // prove the non-null count, so bail rather than overcount.
        var nonNull = 0L
        allStats.foreach { s =>
          s.cols.get(i) match {
            case Some((_, nulls)) => nonNull += s.rows - nulls
            case None             => if (s.rows > 0) return None
          }
        }
        nonNull
      case (MinS(i, dt), _) => foldRange(allStats.toSeq, i, dt, isMin = true) match {
        case Left(()) => return None
        case Right(v) => v
      }
      case (MaxS(i, dt), _) => foldRange(allStats.toSeq, i, dt, isMin = false) match {
        case Left(()) => return None
        case Right(v) => v
      }
      case (SumS(i), _) => foldSum(allStats.toSeq, i) match {
        case Left(()) => return None
        case Right(v) => v
      }
    }
    val schema = StructType(parsed.toSeq.zipWithIndex.map { case ((_, f), i) =>
      f.copy(name = s"agg_$i")
    })
    Some(Result(schema, Seq(values)))
  }

  /** Partition-grouped variant: `GROUP BY <partition columns>` with
    * COUNT/COUNT(col)/MIN/MAX over data columns is answered from the
    * per-file stats sidecars alone — each file belongs to exactly one
    * partition-value tuple, so the group's stats are the union of its
    * files' chunk stats. `SELECT dt, COUNT(*) FROM t GROUP BY dt` on a
    * date-partitioned 100 TB table costs one sidecar read per file and
    * zero data I/O.
    */
  def tryComputeGrouped(
      agg: Aggregation,
      tableSchema: StructType,
      partitionCols: Seq[String],
      conf: Configuration,
      paths: Seq[String],
      useManifest: Boolean = false): Option[Result] = {
    val partSet = partitionCols.toSet
    val dataSchema = StructType(tableSchema.fields.filterNot(f => partSet(f.name)))
    val leaves = CellCodec.flatten(dataSchema)
    val leafIdx = leaves.zipWithIndex.map { case (l, i) => (l.name, i) }.toMap

    // every grouping expression must be a bare partition-column ref;
    // an empty group list means one global group (COUNT(*) over a
    // partitioned table is still metadata-only)
    val groupCols: Seq[String] = agg.groupByExpressions().toSeq.map {
      case f: NamedReference if f.fieldNames().length == 1 &&
          partSet(f.fieldNames()(0)) => f.fieldNames()(0)
      case _ => return None
    }

    def fieldOf(e: VExpr): Option[(Int, DataType)] = e match {
      case f: NamedReference if f.fieldNames().length == 1 =>
        leafIdx.get(f.fieldNames()(0)).map(i => (i, leaves(i).dataType))
      case _ => None
    }
    sealed trait Spec
    case object CS extends Spec
    final case class C(col: Int) extends Spec
    final case class MinS(col: Int, dt: DataType) extends Spec
    final case class MaxS(col: Int, dt: DataType) extends Spec
    final case class SumS(col: Int) extends Spec
    val specs: Array[Option[(Spec, StructField)]] =
      agg.aggregateExpressions().map {
        case _: CountStar => Some((CS, StructField("count", LongType, nullable = false)))
        case c: Count if !c.isDistinct =>
          fieldOf(c.column()).map { case (i, _) =>
            (C(i), StructField("count", LongType, nullable = false)) }
        case m: Min =>
          fieldOf(m.column()).collect { case (i, dt) if statsCapable(dt) =>
            (MinS(i, dt), StructField("min", dt, nullable = true)) }
        case m: Max =>
          fieldOf(m.column()).collect { case (i, dt) if statsCapable(dt) =>
            (MaxS(i, dt), StructField("max", dt, nullable = true)) }
        case s: Sum if !s.isDistinct =>
          fieldOf(s.column()).collect { case (i, dt) if sumCapable(dt) =>
            (SumS(i), StructField("sum", LongType, nullable = true)) }
        case _ => None
      }
    if (specs.exists(_.isEmpty)) return None
    val parsed = specs.map(_.get)

    // per-file stats, grouped by the files' partition values for groupCols
    val files = ColumnFileDataSource.listDataFilesWithRoots(conf, paths, useManifest)
    val groupOrdinals = groupCols.map(partitionCols.indexOf)
    val perFile: Seq[Option[(Seq[String], Seq[ChunkStatsIndex.ChunkStats])]] =
      ColumnFileDataSource.mapFilesParallel(files) { case (root, st) =>
        val rawVals = PartitionLayout.valuesFor(root, st.getPath, partitionCols)
        val key = groupOrdinals.map(rawVals)
        ChunkStatsIndex.readWithLen(conf, st.getPath) match {
          case Some((len, ss)) if len == st.getLen &&
              ss.forall(c => c.off >= 0 && c.bytes >= 0) =>
            Some((key, ss))
          case Some((_, ss)) =>
            val in = new HadoopSeekableInput(
              st.getPath.getFileSystem(conf), st.getPath, st.getLen)
            val chunks =
              try graft.format.ColumnFileReader.scanChunks(in) finally in.close()
            if (ss.length == chunks.length) Some((key, ss)) else None
          case None => None
        }
      }
    if (perFile.exists(_.isEmpty)) return None

    val grouped: Seq[(Seq[String], Seq[ChunkStatsIndex.ChunkStats])] =
      perFile.flatten.groupBy(_._1).toSeq
        .map { case (k, vs) => (k, vs.flatMap(_._2)) }
        .sortBy(_._1)(scala.math.Ordering.Implicits.seqOrdering)
    // a global aggregate over an empty table still yields one row
    val byGroup =
      if (grouped.isEmpty && groupCols.isEmpty)
        Seq((Seq.empty[String], Seq.empty[ChunkStatsIndex.ChunkStats]))
      else grouped

    val groupFields = groupCols.map(c => tableSchema(tableSchema.fieldIndex(c)))
    val rows: Seq[Seq[Any]] = byGroup.map { case (key, stats) =>
      val keyVals: Seq[Any] = key.zip(groupFields).map { case (raw, f) =>
        PartitionLayout.parse(f.dataType, raw)
      }
      val totalRows = stats.iterator.map(_.rows).sum
      val aggVals: Seq[Any] = parsed.toSeq.map {
        case (CS, _) => totalRows
        case (C(i), _) =>
          var nonNull = 0L
          stats.foreach { s =>
            s.cols.get(i) match {
              case Some((_, nulls)) => nonNull += s.rows - nulls
              case None             => if (s.rows > 0) return None
            }
          }
          nonNull
        case (MinS(i, dt), _) => foldRange(stats, i, dt, isMin = true) match {
          case Left(()) => return None
          case Right(v) => v
        }
        case (MaxS(i, dt), _) => foldRange(stats, i, dt, isMin = false) match {
          case Left(()) => return None
          case Right(v) => v
        }
        case (SumS(i), _) => foldSum(stats, i) match {
          case Left(()) => return None
          case Right(v) => v
        }
      }
      keyVals ++ aggVals
    }
    val schema = StructType(
      groupFields.zipWithIndex.map { case (f, i) => f.copy(name = s"grp_$i") } ++
        parsed.toSeq.zipWithIndex.map { case ((_, f), i) => f.copy(name = s"agg_$i") })
    Some(Result(schema, rows))
  }

  /** SUM pushdown: pure integral types only. Floats are excluded on
    * principle (order-dependent addition — a stats answer could differ
    * bitwise from the scan's); decimals/dates/timestamps/booleans don't
    * carry sum stats. Spark types SUM(integral) as LongType, matching
    * the sidecar's exact Long accumulation.
    */
  private def sumCapable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType => true
    case _ => false
  }

  /** Exact SUM from chunk sum stats. Left(()) = some chunk has non-null
    * values but no (or an overflowed) sum entry — fall back to the scan,
    * whose non-ANSI wrap is Spark's own semantics. Right(null) = the
    * column is all NULL.
    */
  private def foldSum(
      stats: Seq[ChunkStatsIndex.ChunkStats],
      col: Int): Either[Unit, Any] = {
    var acc = 0L
    var sawValue = false
    stats.foreach { s =>
      s.cols.get(col) match {
        case Some((_, nulls)) =>
          s.sums.get(col) match {
            case Some(sum) =>
              sawValue = true
              try acc = Math.addExact(acc, sum)
              catch { case _: ArithmeticException => return Left(()) }
            case None =>
              // entry without a sum: all-null chunk contributes nothing;
              // values present means pre-sum sidecar or overflow — bail
              if (nulls < s.rows) return Left(())
          }
        case None =>
          if (s.rows > 0) return Left(()) // absent column: ragged/foreign
      }
    }
    if (!sawValue) Right(null) else Right(acc)
  }

  private def statsCapable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | BooleanType |
         DoubleType | FloatType | StringType => true
    case d: DecimalType => d.precision <= 18 // unscaled-long stats family
    case _ => false
  }

  /** Fold chunk ranges into a global min/max Catalyst value.
    * Left(()) = a chunk has non-null values for the column but no range
    * stats (can't answer exactly). Right(null) = column is all NULL.
    */
  private def foldRange(
      stats: Seq[ChunkStatsIndex.ChunkStats],
      col: Int, dt: DataType, isMin: Boolean): Either[Unit, Any] = {
    import ChunkStatsIndex._
    var accL = if (isMin) Long.MaxValue else Long.MinValue
    var accD = if (isMin) Double.PositiveInfinity else Double.NegativeInfinity
    var accS: String = null
    var sawValue = false
    stats.foreach { s =>
      s.cols.get(col) match {
        case Some((Some(r), _)) =>
          sawValue = true
          r match {
            case LongRange(lo, hi) =>
              val v = if (isMin) lo else hi
              accL = if (isMin) math.min(accL, v) else math.max(accL, v)
            case DoubleRange(lo, hi) =>
              val v = if (isMin) lo else hi
              accD = if (isMin) math.min(accD, v) else math.max(accD, v)
            case StringRange(lo, hi) =>
              // UTF-8 byte order, matching the engine's string comparison
              val v = if (isMin) lo else hi
              if (accS == null) accS = v
              else if (isMin) { if (ChunkStatsIndex.utf8Cmp(v, accS) < 0) accS = v }
              else { if (ChunkStatsIndex.utf8Cmp(v, accS) > 0) accS = v }
          }
        case Some((None, nulls)) =>
          // Range-less entry with non-null values present: either a
          // NaN-containing float/double chunk (ranges are withheld so the
          // NaN-greatest total order can't be misrepresented) or a
          // non-capable type. MIN/MAX can't be answered exactly — bail.
          if (nulls < s.rows && s.rows > 0) {
            return Left(())
          }
        case None =>
          // No entry for this column at all. Our writer records every
          // projected column, so this only happens with a foreign or
          // hand-edited sidecar — and then the chunk may well hold values
          // the fold would silently miss. Mirror the COUNT(col) guard and
          // bail to the real scan (a legitimately ragged chunk never has a
          // sidecar: only the full-width writer produces them).
          if (s.rows > 0) return Left(())
      }
    }
    if (!sawValue) Right(null)
    else Right(dt match {
      case LongType | TimestampType | TimestampNTZType => accL
      case IntegerType | DateType => accL.toInt
      case ShortType => accL.toShort
      case ByteType => accL.toByte
      case BooleanType => accL != 0L
      case DoubleType => accD
      case FloatType => accD.toFloat
      case StringType => UTF8String.fromString(accS)
      case d: DecimalType if d.precision <= 18 =>
        org.apache.spark.sql.types.Decimal.createUnsafe(accL, d.precision, d.scale)
      case _ => return Left(())
    })
  }
}

/** Single-partition scan that emits precomputed rows. */
final case class PrecomputedPartition(values: Array[Byte]) extends InputPartition

class PrecomputedAggScan(schema: StructType, rows: Seq[Seq[Any]])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"columnfile stats-only aggregate ${schema.catalogString}"
  override def planInputPartitions(): Array[InputPartition] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(rows.map(_.map {
      case u: UTF8String => ("u", u.toString)
      case other         => ("v", other)
    }))
    oos.close()
    Array(PrecomputedPartition(bos.toByteArray))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = {
            val ois = new java.io.ObjectInputStream(
              new java.io.ByteArrayInputStream(
                p.asInstanceOf[PrecomputedPartition].values))
            ois.readObject().asInstanceOf[Seq[Seq[(String, Any)]]].map(_.map {
              case ("u", s: String) => UTF8String.fromString(s)
              case (_, v)           => v
            })
          }
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            new GenericInternalRow(rows(i).toArray)
          override def close(): Unit = ()
        }
    }
}
