package graft.spark

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXACT SQL three-valued evaluation of pushdown `Filter`s over a
  * partition-value tuple — the decision procedure behind
  * `INSERT OVERWRITE` by filter.
  *
  * This is deliberately NOT [[FilterEval]]/[[ChunkStatsIndex]] pruning
  * logic: pruning may over-approximate ("might match") because a kept
  * chunk is merely re-checked downstream, but overwrite DELETES the
  * files it selects, so every answer here must be exact. Partition
  * values are constant per file, which makes exactness easy — but any
  * filter shape this evaluator does not fully understand must be
  * REJECTED up front ([[supported]]), never approximated.
  *
  * Value domains: partition columns are directory-renderable atomics
  * (PartitionLayout.supported); both the Catalyst-side partition value
  * and the literal normalize into the Long family (ints, boolean,
  * date-days) or String, mirroring the stats normalization.
  */
object PartitionFilterEval {

  /** Normalize a CATALYST partition value (PartitionLayout.parse output). */
  private def normValue(dt: DataType, v: Any): Option[Any] = v match {
    case null => None
    case _ => dt match {
      case LongType    => Some(v.asInstanceOf[Long])
      case IntegerType | DateType => Some(v.asInstanceOf[Int].toLong)
      case ShortType   => Some(v.asInstanceOf[Short].toLong)
      case ByteType    => Some(v.asInstanceOf[Byte].toLong)
      case BooleanType => Some(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case StringType  => Some(v.asInstanceOf[UTF8String].toString)
      case _           => scala.None
    }
  }

  /** Normalize a pushdown LITERAL into the same families (shared with the
    * stats index so date/timestamp external types round-trip identically).
    */
  private def normLit(dt: DataType, v: Any): Option[Any] =
    ChunkStatsIndex.lit(dt, v)

  private def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: String, y: String) => ChunkStatsIndex.utf8Cmp(x, y)
    case other => throw new IllegalStateException(s"incomparable $other")
  }

  /** True iff `matches` can evaluate `f` EXACTLY given only the named
    * partition columns: every referenced attribute is a partition column
    * of a normalizable type, every node is a shape we implement, and
    * every non-null literal normalizes. Callers must reject unsupported
    * filters before committing to an overwrite.
    */
  def supported(f: Filter, partCols: Set[String], schema: StructType): Boolean = {
    def colOk(a: String): Boolean =
      partCols.contains(a) && schema.fields.exists(fl =>
        fl.name == a && PartitionLayout.supported(fl.dataType))
    def dtOf(a: String): DataType = schema(a).dataType
    def litOk(a: String, v: Any): Boolean =
      v == null || normLit(dtOf(a), v).isDefined
    f match {
      case AlwaysTrue() | AlwaysFalse() => true
      case And(l, r) => supported(l, partCols, schema) && supported(r, partCols, schema)
      case Or(l, r)  => supported(l, partCols, schema) && supported(r, partCols, schema)
      case Not(c)    => supported(c, partCols, schema)
      case EqualTo(a, v)            => colOk(a) && litOk(a, v)
      case EqualNullSafe(a, v)      => colOk(a) && litOk(a, v)
      case GreaterThan(a, v)        => colOk(a) && v != null && litOk(a, v)
      case GreaterThanOrEqual(a, v) => colOk(a) && v != null && litOk(a, v)
      case LessThan(a, v)           => colOk(a) && v != null && litOk(a, v)
      case LessThanOrEqual(a, v)    => colOk(a) && v != null && litOk(a, v)
      case In(a, vs)                => colOk(a) && vs.forall(v => litOk(a, v))
      case IsNull(a)    => colOk(a)
      case IsNotNull(a) => colOk(a)
      case StringStartsWith(a, p) => colOk(a) && p != null &&
        dtOf(a) == StringType
      case _ => false
    }
  }

  /** SQL 3VL result of `f` on the tuple; None = UNKNOWN. `values` maps
    * partition column name -> CATALYST value (null for the Hive null
    * partition). Only call after [[supported]] accepted the filter.
    */
  private def eval(f: Filter, values: Map[String, Any], schema: StructType): Option[Boolean] = {
    def dtOf(a: String): DataType = schema(a).dataType
    def cmp3(a: String, v: Any)(sat: Int => Boolean): Option[Boolean] =
      (normValue(dtOf(a), values(a)), normLit(dtOf(a), v)) match {
        case (Some(x), Some(l)) => Some(sat(compare(x, l)))
        case _ => scala.None // null on either side => UNKNOWN
      }
    f match {
      case AlwaysTrue()  => Some(true)
      case AlwaysFalse() => Some(false)
      case And(l, r) =>
        (eval(l, values, schema), eval(r, values, schema)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true))            => Some(true)
          case _                                   => scala.None
        }
      case Or(l, r) =>
        (eval(l, values, schema), eval(r, values, schema)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false))        => Some(false)
          case _                                 => scala.None
        }
      case Not(c) => eval(c, values, schema).map(!_)
      case EqualTo(a, v)            => cmp3(a, v)(_ == 0)
      case GreaterThan(a, v)        => cmp3(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp3(a, v)(_ >= 0)
      case LessThan(a, v)           => cmp3(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => cmp3(a, v)(_ <= 0)
      case EqualNullSafe(a, v) =>
        val x = normValue(dtOf(a), values(a))
        val l = if (v == null) scala.None else normLit(dtOf(a), v)
        Some((x, l) match {
          case (Some(xx), Some(ll)) => compare(xx, ll) == 0
          case (scala.None, scala.None) => true
          case _ => false
        })
      case In(a, vs) =>
        // x IN (v1..vn): TRUE if any equals, UNKNOWN if no match but a
        // null participant exists, else FALSE
        val results = vs.toSeq.map(v => cmp3(a, v)(_ == 0))
        if (results.exists(_.contains(true))) Some(true)
        else if (results.exists(_.isEmpty) || normValue(dtOf(a), values(a)).isEmpty)
          scala.None
        else Some(false)
      case IsNull(a)    => Some(values(a) == null)
      case IsNotNull(a) => Some(values(a) != null)
      case StringStartsWith(a, p) =>
        normValue(dtOf(a), values(a)).map(_.asInstanceOf[String].startsWith(p))
      case other => throw new IllegalArgumentException(
        s"columnfile: unsupported overwrite filter $other")
    }
  }

  /** True iff the partition tuple SATISFIES the conjunction of `filters`
    * (UNKNOWN rows are not matched, per SQL DELETE/overwrite semantics).
    */
  def matches(filters: Seq[Filter], values: Map[String, Any], schema: StructType): Boolean =
    filters.forall(f => eval(f, values, schema).contains(true))
}
