package graft.spark

import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial soundness property for driver-side chunk pruning: for
  * randomized chunks and randomized filters, `provesEmpty == true` must
  * imply that NO row of the chunk satisfies the filter under the
  * engine's comparison semantics (NaN greatest & self-equal, -0.0 ==
  * 0.0, UTF-8 byte order for strings). Pruning is unrecoverable — a
  * pruned chunk never becomes a task — so this is the property that,
  * had it existed in round 2, would have caught the StringStartsWith
  * low-side bug.
  *
  * Deterministic seed: failures reproduce.
  */
class PruningSoundnessSpec extends AnyFunSuite {
  import ChunkStatsIndex._

  private val rnd = new scala.util.Random(20260812L)

  // ---- ground-truth row-level evaluation (engine semantics) ----

  private def cmpAny(dt: DataType, a: Any, lit: Any): Option[Int] = (dt, a, lit) match {
    case (_, null, _) => None
    case (LongType, x: Long, v: Long) => Some(java.lang.Long.compare(x, v))
    case (DoubleType, x: Double, v: Double) =>
      Some(SQLOrderingUtil.compareDoubles(x, v))
    case (StringType, x: String, v: String) =>
      Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(v)))
    case (_: DecimalType, x: Decimal, v: java.math.BigDecimal) =>
      Some(x.toJavaBigDecimal.compareTo(v))
    case _ => None
  }

  private def rowMatches(dt: DataType, value: Any, f: Filter): Boolean = f match {
    case And(l, r) => rowMatches(dt, value, l) && rowMatches(dt, value, r)
    case Or(l, r)  => rowMatches(dt, value, l) || rowMatches(dt, value, r)
    case EqualTo(_, v)            => cmpAny(dt, value, v).contains(0)
    case EqualNullSafe(_, v)      =>
      if (v == null) value == null else cmpAny(dt, value, v).contains(0)
    case GreaterThan(_, v)        => cmpAny(dt, value, v).exists(_ > 0)
    case GreaterThanOrEqual(_, v) => cmpAny(dt, value, v).exists(_ >= 0)
    case LessThan(_, v)           => cmpAny(dt, value, v).exists(_ < 0)
    case LessThanOrEqual(_, v)    => cmpAny(dt, value, v).exists(_ <= 0)
    case In(_, vs)                => vs.exists(v => cmpAny(dt, value, v).contains(0))
    case IsNull(_)                => value == null
    case IsNotNull(_)             => value != null
    case StringStartsWith(_, p)   => value != null &&
      UTF8String.fromString(value.asInstanceOf[String])
        .startsWith(UTF8String.fromString(p))
    case other => fail(s"unhandled filter $other")
  }

  // ---- generators ----

  private val longPool: Seq[Long] =
    Seq(Long.MinValue, -100L, -1L, 0L, 1L, 99L, 100L, 101L, Long.MaxValue)
  private val doublePool: Seq[Double] =
    Seq(Double.NegativeInfinity, -100.5, -0.0, 0.0, 1.5, 99.75,
      Double.PositiveInfinity, Double.NaN)
  private val stringPool: Seq[String] =
    Seq("", "a", "appl", "applz", "appm", "b", "ba", "",
      new String(Character.toChars(0x10000)), "zzz")
  private val dec = DecimalType(10, 2)
  private val decimalPool: Seq[Decimal] =
    Seq("-99999999.99", "-1.50", "-0.01", "0.00", "0.25", "1.50",
      "99999999.99").map(s => Decimal(new java.math.BigDecimal(s), 10, 2))

  private def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  private def genValues(dt: DataType, n: Int): Seq[Any] = {
    val pool: Seq[Any] = dt match {
      case LongType   => longPool
      case DoubleType => doublePool
      case StringType => stringPool
      case _: DecimalType => decimalPool
      case other      => fail(s"no pool for $other")
    }
    Seq.fill(n)(if (rnd.nextInt(10) == 0) null else pick(pool))
  }

  private def genLeaf(dt: DataType, attr: String = "c"): Filter = {
    def lit: Any = dt match {
      case LongType   => pick(longPool)
      case DoubleType => java.lang.Double.valueOf(pick(doublePool))
      case StringType => pick(stringPool)
      case _: DecimalType =>
        // includes literals whose scale exceeds the column's (they must
        // refuse to prune, never prune wrongly)
        pick(decimalPool.map(_.toJavaBigDecimal) :+
          new java.math.BigDecimal("0.005") :+
          new java.math.BigDecimal("1.250"))
      case other      => fail(s"$other")
    }
    rnd.nextInt(if (dt == StringType) 10 else 9) match {
      case 0 => EqualTo(attr, lit)
      case 1 => EqualNullSafe(attr, lit)
      case 2 => GreaterThan(attr, lit)
      case 3 => GreaterThanOrEqual(attr, lit)
      case 4 => LessThan(attr, lit)
      case 5 => LessThanOrEqual(attr, lit)
      case 6 => In(attr, Array(lit, lit, lit))
      case 7 => IsNull(attr)
      case 8 => IsNotNull(attr)
      case 9 => StringStartsWith(attr, pick(stringPool.filter(_.length <= 4)))
    }
  }

  private def genFilter(dt: DataType, depth: Int, attr: String = "c"): Filter =
    if (depth == 0 || rnd.nextInt(3) > 0) genLeaf(dt, attr)
    else if (rnd.nextBoolean())
      And(genFilter(dt, depth - 1, attr), genFilter(dt, depth - 1, attr))
    else Or(genFilter(dt, depth - 1, attr), genFilter(dt, depth - 1, attr))

  private def statsOf(dt: DataType, values: Seq[Any]): ChunkStats = {
    val schema = StructType(Seq(StructField("c", dt)))
    // blooms enabled: EqualTo/In cases also exercise bloom pruning, so
    // the soundness property covers it (pool values repeat across the
    // chunk and the literal pool, so both hit and miss paths occur)
    val coll = new Collector(CellCodec.flatten(schema), Set(0))
    values.foreach { v =>
      val cell =
        if (v == null) null
        else dt match {
          case StringType => CellCodec.encode(dt, UTF8String.fromString(v.asInstanceOf[String]))
          case _          => CellCodec.encode(dt, v)
        }
      coll.observe(Array(cell))
    }
    coll.finishChunk()
  }

  test("provesEmpty never prunes a chunk containing a matching row (5000 random cases per type)") {
    val leafIndex = Map("c" -> 0)
    Seq[DataType](LongType, DoubleType, StringType, dec).foreach { dt =>
      val leafType: Map[String, DataType] = Map("c" -> dt)
      var pruned = 0
      for (_ <- 0 until 5000) {
        val values = genValues(dt, 1 + rnd.nextInt(6))
        val stats = statsOf(dt, values)
        val filter = genFilter(dt, 2)
        if (provesEmpty(filter, stats, leafIndex, leafType)) {
          pruned += 1
          values.foreach { v =>
            assert(!rowMatches(dt, v, filter),
              s"UNSOUND PRUNE: $dt filter=$filter values=$values " +
                s"matching=$v stats=$stats")
          }
        }
      }
      // the property is vacuous if nothing ever prunes — require signal
      assert(pruned > 200, s"$dt: only $pruned/5000 cases pruned; generator too weak")
    }
  }

  test("task-side FilterEval never drops a row the engine would keep (5000 random cases per type)") {
    Seq[DataType](LongType, DoubleType, StringType, dec).foreach { dt =>
      val schema = StructType(Seq(StructField("c", dt)))
      val leafIndex = Map("c" -> 0)
      var dropped = 0
      for (_ <- 0 until 5000) {
        val filter = genFilter(dt, 2)
        val bounds = FilterEval.bind(filter, schema, leafIndex)
        val v = genValues(dt, 1).head
        val cell =
          if (v == null) null
          else dt match {
            case StringType =>
              CellCodec.encode(dt, UTF8String.fromString(v.asInstanceOf[String]))
            case _ => CellCodec.encode(dt, v)
          }
        val survives = bounds.forall(_.eval(cell))
        if (!survives) dropped += 1
        if (rowMatches(dt, v, filter)) {
          assert(survives,
            s"UNSOUND DROP: $dt filter=$filter value=$v bounds=${bounds.length}")
        }
      }
      assert(dropped > 500, s"$dt: only $dropped/5000 dropped; generator too weak")
    }
  }

  test("nested-leaf pruning + task-side eval stay sound (2000 random cases per type)") {
    // filters arrive with dotted attributes ("s.a") and bind to the
    // shredded leaf column; rows inside a NULL struct read as null leaves
    Seq[DataType](LongType, StringType).foreach { dt =>
      val schema = StructType(Seq(StructField("s",
        StructType(Seq(StructField("a", dt))), nullable = true)))
      val leaves = CellCodec.flatten(schema) // [s (presence), s.a]
      val leafIndex = leaves.zipWithIndex.map { case (l, i) => l.name -> i }.toMap
      val leafType = leaves.map(l => l.name -> l.dataType).toMap
      assert(leafIndex("s.a") == 1)
      var pruned = 0
      var dropped = 0
      for (_ <- 0 until 2000) {
        val raw = genValues(dt, 1 + rnd.nextInt(6))
        // 1-in-5 rows: the STRUCT itself is null (presence 0, leaf null)
        val rows: Seq[Option[Any]] =
          raw.map(v => if (rnd.nextInt(5) == 0) None else Some(v))
        def leafCell(v: Any): Array[Byte] =
          if (v == null) null
          else dt match {
            case StringType =>
              CellCodec.encode(dt, UTF8String.fromString(v.asInstanceOf[String]))
            case _ => CellCodec.encode(dt, v)
          }
        val coll = new Collector(leaves, Set.empty)
        rows.foreach {
          case None    => coll.observe(Array(Array(0.toByte), null))
          case Some(v) => coll.observe(Array(Array(1.toByte), leafCell(v)))
        }
        val stats = coll.finishChunk()
        val filter = genFilter(dt, 2, "s.a")
        // effective leaf value: null when the struct is null
        val effective = rows.map(_.orNull)
        if (provesEmpty(filter, stats, leafIndex, leafType)) {
          pruned += 1
          effective.foreach { v =>
            assert(!rowMatches(dt, v, filter),
              s"UNSOUND NESTED PRUNE: $dt filter=$filter rows=$rows matching=$v")
          }
        }
        val bounds = FilterEval.bind(filter, schema, leafIndex)
        bounds.foreach(b => assert(b.col == 1, s"bound to wrong leaf: ${b.col}"))
        effective.foreach { v =>
          val survives = bounds.forall(_.eval(leafCell(v)))
          if (!survives) dropped += 1
          if (rowMatches(dt, v, filter))
            assert(survives, s"UNSOUND NESTED DROP: $dt filter=$filter value=$v")
        }
      }
      assert(pruned > 50, s"$dt: only $pruned/2000 nested cases pruned")
      assert(dropped > 200, s"$dt: only $dropped nested drops; generator too weak")
    }
  }
}
