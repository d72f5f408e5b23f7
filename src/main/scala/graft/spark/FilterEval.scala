package graft.spark

import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binds Catalyst `sources.Filter`s to predicates over raw cell bytes, so
  * the scan can evaluate pushed filters per chunk and skip data (the Spark
  * analog of the reference's filter cascade + chunk skip,
  * src/columnfile-select.cc:90-176).
  *
  * Every pushed filter is also returned to Catalyst as a residual, so the
  * only correctness obligation here is: never drop a row the filter would
  * keep. Evaluation therefore follows SQL three-valued logic exactly
  * (`Tri`: TRUE / FALSE / UNKNOWN), and a row survives only when the
  * bound predicate is TRUE — matching `FilterExec` semantics.
  */
object FilterEval {

  final case class Bound(col: Int, eval: Array[Byte] => Boolean)

  // Tri-state encoding for SQL three-valued logic.
  private final val TRUE = 1
  private final val FALSE = 0
  private final val UNKNOWN = -1

  /** Tri-state predicate over one physical column's cell bytes. */
  private final case class TriBound(col: Int, eval: Array[Byte] => Int)

  /** Pass 1 of a filtered chunk read, shared by the row and columnar
    * readers: drain the filter columns and build the survivor bitmap.
    *
    * Dictionary-encoded columns evaluate each predicate ONCE PER
    * DICTIONARY ENTRY (≤ 64k) instead of once per row — the classic
    * dictionary-filter optimization: a selective equality over a
    * categorical column costs |dict| byte comparisons + one boolean
    * array lookup per row. When no entry (and not NULL) satisfies a
    * filter, the chunk skips before the row loop runs at all.
    *
    * Rows past a ragged column's end read as NULL, exactly like the
    * per-cell path.
    */
  def survivorBitmap(
      decoders: scala.collection.Map[Int, graft.format.ColumnDecoder],
      filterEvals: Array[Bound],
      rowCount: Int): java.util.BitSet = {
    val filterCols = filterEvals.map(_.col).distinct
    // drain each filter column once: ids for dict blocks, unboxed longs
    // for packed-numeric blocks, cells otherwise
    val cellsByCol = scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Array[Byte]]]
    val idsByCol = scala.collection.mutable.HashMap.empty[Int, (Array[Array[Byte]], scala.collection.mutable.ArrayBuffer[Int])]
    val packedByCol = scala.collection.mutable.HashMap.empty[Int, (Array[Long], java.util.BitSet, Int)]
    filterCols.foreach { c =>
      decoders.get(c) match {
        case Some(d) if d.isDictEncoded =>
          val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
          while (d.hasNext) ids += d.nextId()
          idsByCol(c) = (d.dictionary, ids)
        case Some(d) if d.isPackedNumeric =>
          val vals = new scala.collection.mutable.ArrayBuilder.ofLong
          val nulls = new java.util.BitSet()
          var i = 0
          while (d.hasNext) {
            if (d.nextPacked()) vals += d.packedValue
            else { nulls.set(i); vals += 0L }
            i += 1
          }
          packedByCol(c) = (vals.result(), nulls, d.packedWidth)
        case Some(d) =>
          val cells = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (d.hasNext) cells += d.next()
          cellsByCol(c) = cells
        case None =>
          cellsByCol(c) = scala.collection.mutable.ArrayBuffer.empty
      }
    }
    // pre-pass: evaluate each filter over the dictionaries first — an
    // unsatisfiable filter (no entry passes, NULL rejected) empties the
    // chunk before any row predicate is even built
    val dictTables: Array[Option[(Array[Boolean], Boolean, scala.collection.mutable.ArrayBuffer[Int])]] =
      filterEvals.map { fe =>
        idsByCol.get(fe.col).map { case (dict, ids) =>
          (dict.map(fe.eval), fe.eval(null), ids)
        }
      }
    if (dictTables.exists {
        case Some((byId, nullPass, _)) => !nullPass && !byId.contains(true)
        case None => false
      }) return new java.util.BitSet(rowCount) // chunk skipped
    val survivors = new java.util.BitSet(rowCount)
    // per-filter row predicate; dict columns go through a pass-by-id table
    val rowEvals: Array[Int => Boolean] =
      filterEvals.zip(dictTables).map {
        case (_, Some((byId, nullPass, ids))) =>
          (r: Int) => {
            val id = if (r < ids.length) ids(r) else -1
            if (id < 0) nullPass else byId(id)
          }
        case (fe, None) =>
          packedByCol.get(fe.col) match {
            case Some((vals, nulls, width)) =>
              // packed-numeric: evaluate from the unboxed long view with
              // one reused scratch buffer — no per-cell allocation.
              // Sound because every bound predicate decodes its cell
              // eagerly (the comparators call CellCodec.decode /
              // compare immediately and never retain the array).
              val scratch = new Array[Byte](width)
              (r: Int) =>
                if (r >= vals.length || nulls.get(r)) fe.eval(null)
                else {
                  val v = vals(r)
                  var k = 0
                  while (k < width) {
                    scratch(k) = ((v >>> (8 * k)) & 0xff).toByte
                    k += 1
                  }
                  fe.eval(scratch)
                }
            case None =>
              val cells = cellsByCol(fe.col)
              (r: Int) => fe.eval(if (r < cells.length) cells(r) else null)
          }
      }
    var r = 0
    while (r < rowCount) {
      var ok = true
      var i = 0
      while (ok && i < rowEvals.length) { ok = rowEvals(i)(r); i += 1 }
      if (ok) survivors.set(r)
      r += 1
    }
    survivors
  }

  def evaluable(f: Filter, schema: StructType): Boolean = {
    val leaves = CellCodec.flatten(schema)
    val idx = leaves.zipWithIndex.map { case (l, i) => (l.name, i) }.toMap
    bind(f, schema, idx).nonEmpty
  }

  /** Bind a filter to per-column predicates. A top-level `And` splits into
    * independent bounds (all bounds are intersected by the reader); any
    * unbindable sub-filter simply contributes nothing — the result is a
    * safe over-approximation of the filter.
    */
  def bind(f: Filter, schema: StructType, leafIndex: Map[String, Int]): Seq[Bound] = {
    val leaves = CellCodec.flatten(schema)
    def leafType(name: String): Option[DataType] =
      leafIndex.get(name).map(i => leaves(i).dataType)
    f match {
      case And(l, r) =>
        bind(l, schema, leafIndex) ++ bind(r, schema, leafIndex)
      case other =>
        bindTri(other, leafType, leafIndex).map(tb =>
          Bound(tb.col, cell => tb.eval(cell) == TRUE)).toSeq
    }
  }

  private def bindTri(
      f: Filter,
      leafType: String => Option[DataType],
      leafIndex: Map[String, Int]): Option[TriBound] = {

    def cmpBound(attr: String, lit: Any)(accept: Int => Boolean): Option[TriBound] =
      for {
        col <- leafIndex.get(attr)
        dt <- leafType(attr)
        cmp <- comparator(dt, lit)
      } yield TriBound(col, cell =>
        if (cell == null) UNKNOWN
        else if (accept(cmp(cell))) TRUE else FALSE)

    def strBound(attr: String, test: UTF8String => Boolean): Option[TriBound] =
      for {
        col <- leafIndex.get(attr)
        dt <- leafType(attr) if dt == StringType
      } yield TriBound(col, cell =>
        if (cell == null) UNKNOWN
        else if (test(UTF8String.fromBytes(cell))) TRUE else FALSE)

    f match {
      case EqualTo(a, v)            => cmpBound(a, v)(_ == 0)
      case GreaterThan(a, v)        => cmpBound(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmpBound(a, v)(_ >= 0)
      case LessThan(a, v)           => cmpBound(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => cmpBound(a, v)(_ <= 0)

      case EqualNullSafe(a, v) =>
        if (v == null)
          leafIndex.get(a).map(col =>
            TriBound(col, cell => if (cell == null) TRUE else FALSE))
        else
          for {
            col <- leafIndex.get(a)
            dt <- leafType(a)
            cmp <- comparator(dt, v)
          } yield TriBound(col, cell =>
            if (cell == null) FALSE
            else if (cmp(cell) == 0) TRUE else FALSE)

      case In(a, values) =>
        for {
          col <- leafIndex.get(a)
          dt <- leafType(a)
          nonNull = values.filter(_ != null)
          cmps <- sequence(nonNull.toSeq.map(v => comparator(dt, v)))
        } yield {
          val hasNullLiteral = values.exists(_ == null)
          TriBound(col, cell =>
            if (cell == null) UNKNOWN
            else if (cmps.exists(c => c(cell) == 0)) TRUE
            else if (hasNullLiteral) UNKNOWN
            else FALSE)
        }

      case IsNull(a) =>
        leafIndex.get(a).map(col =>
          TriBound(col, cell => if (cell == null) TRUE else FALSE))
      case IsNotNull(a) =>
        leafIndex.get(a).map(col =>
          TriBound(col, cell => if (cell == null) FALSE else TRUE))

      case StringStartsWith(a, p) =>
        val pfx = UTF8String.fromString(p)
        strBound(a, s => s.startsWith(pfx))
      case StringEndsWith(a, p) =>
        val sfx = UTF8String.fromString(p)
        strBound(a, s => s.endsWith(sfx))
      case StringContains(a, p) =>
        val sub = UTF8String.fromString(p)
        strBound(a, s => s.contains(sub))

      case Not(inner) =>
        bindTri(inner, leafType, leafIndex).map(tb =>
          TriBound(tb.col, cell => tb.eval(cell) match {
            case TRUE    => FALSE
            case FALSE   => TRUE
            case UNKNOWN => UNKNOWN
          }))

      case Or(l, r) =>
        for {
          lb <- bindTri(l, leafType, leafIndex)
          rb <- bindTri(r, leafType, leafIndex)
          if lb.col == rb.col // single-column bound only
        } yield TriBound(lb.col, cell => {
          val a = lb.eval(cell); val b = rb.eval(cell)
          if (a == TRUE || b == TRUE) TRUE
          else if (a == UNKNOWN || b == UNKNOWN) UNKNOWN
          else FALSE
        })

      case _ => None
    }
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** cell-bytes => sign of (cellValue compare literal), per data type.
    * None when the type/literal pairing isn't supported (filter then just
    * isn't evaluated scan-side).
    */
  private def comparator(dt: DataType, lit: Any): Option[Array[Byte] => Int] = {
    def longCmp(target: Long): Array[Byte] => Int =
      cell => java.lang.Long.compare(CellCodec.decode(dt, cell).asInstanceOf[Long], target)
    def intCmp(target: Int): Array[Byte] => Int =
      cell => Integer.compare(CellCodec.decode(dt, cell).asInstanceOf[Int], target)
    (dt, lit) match {
      case (StringType, s: String) =>
        val t = UTF8String.fromString(s)
        Some(cell => UTF8String.fromBytes(cell).compareTo(t))
      case (StringType, s: UTF8String) =>
        Some(cell => UTF8String.fromBytes(cell).compareTo(s))
      case (IntegerType, v: java.lang.Integer) => Some(intCmp(v))
      case (LongType, v: java.lang.Long)       => Some(longCmp(v))
      case (LongType, v: java.lang.Integer)    => Some(longCmp(v.longValue()))
      case (ShortType, v: java.lang.Short) =>
        Some(cell => java.lang.Short.compare(
          CellCodec.decode(dt, cell).asInstanceOf[Short], v))
      case (ByteType, v: java.lang.Byte) =>
        Some(cell => java.lang.Byte.compare(
          CellCodec.decode(dt, cell).asInstanceOf[Byte], v))
      // SQLOrderingUtil = the engine's float semantics: -0.0 == 0.0 and
      // NaN = NaN, NaN greatest. java.lang.Double.compare would order
      // -0.0 < 0.0 and silently drop rows `= 0.0` should keep.
      case (DoubleType, v: java.lang.Double) =>
        Some(cell => org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(
          CellCodec.decode(dt, cell).asInstanceOf[Double], v))
      case (FloatType, v: java.lang.Float) =>
        Some(cell => org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareFloats(
          CellCodec.decode(dt, cell).asInstanceOf[Float], v))
      case (BooleanType, v: java.lang.Boolean) =>
        Some(cell => java.lang.Boolean.compare(
          CellCodec.decode(dt, cell).asInstanceOf[Boolean], v))
      case (DateType, v: java.sql.Date) =>
        Some(intCmp(DateTimeUtils.fromJavaDate(v)))
      case (DateType, v: java.time.LocalDate) =>
        Some(intCmp(DateTimeUtils.localDateToDays(v)))
      case (TimestampType, v: java.sql.Timestamp) =>
        Some(longCmp(DateTimeUtils.fromJavaTimestamp(v)))
      case (TimestampType, v: java.time.Instant) =>
        Some(longCmp(DateTimeUtils.instantToMicros(v)))
      case (d: DecimalType, v: java.math.BigDecimal) =>
        Some(cell => CellCodec.decode(d, cell).asInstanceOf[Decimal]
          .toJavaBigDecimal.compareTo(v))
      case (d: DecimalType, v: Decimal) =>
        Some(cell => CellCodec.decode(d, cell).asInstanceOf[Decimal]
          .toJavaBigDecimal.compareTo(v.toJavaBigDecimal))
      case (BinaryType, v: Array[Byte]) =>
        Some(cell => compareBytes(cell, v))
      case _ => None
    }
  }

  /** Unsigned lexicographic byte compare (matches Spark's BinaryType ordering). */
  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }
}
