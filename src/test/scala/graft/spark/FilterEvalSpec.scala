package graft.spark

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Three-valued-logic unit tests for the scan-side filter binding.
  * Contract: a bound predicate returns true iff the SQL filter would be
  * TRUE for the row — NULL cells never survive null-rejecting filters,
  * and Not(unknown) stays unknown (row dropped), matching FilterExec.
  */
class FilterEvalSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("d", DoubleType)))
  private val leafIdx = CellCodec.flatten(schema).zipWithIndex
    .map { case (l, i) => (l.name, i) }.toMap

  private def cellL(v: Long) = CellCodec.encode(LongType, v)
  private def cellS(v: String) =
    CellCodec.encode(StringType, org.apache.spark.unsafe.types.UTF8String.fromString(v))
  private def cellD(v: Double) = CellCodec.encode(DoubleType, v)

  private def evalOne(f: Filter, cell: Array[Byte]): Boolean = {
    val bounds = FilterEval.bind(f, schema, leafIdx)
    assert(bounds.nonEmpty, s"filter $f did not bind")
    bounds.forall(_.eval(cell))
  }

  test("comparisons with null cells never survive") {
    for (f <- Seq[Filter](EqualTo("id", 5L), GreaterThan("id", 1L),
        LessThan("id", 10L), In("id", Array(5L)),
        Not(EqualTo("id", 5L)), StringContains("s", "x"))) {
      val cell: Array[Byte] = null
      val bounds = FilterEval.bind(f, schema, leafIdx)
      assert(bounds.nonEmpty && !bounds.forall(_.eval(cell)), s"null survived $f")
    }
  }

  test("comparison operators") {
    assert(evalOne(EqualTo("id", 5L), cellL(5)))
    assert(!evalOne(EqualTo("id", 5L), cellL(6)))
    assert(evalOne(GreaterThan("id", 5L), cellL(6)))
    assert(!evalOne(GreaterThan("id", 5L), cellL(5)))
    assert(evalOne(GreaterThanOrEqual("id", 5L), cellL(5)))
    assert(evalOne(LessThan("d", 1.5), cellD(1.25)))
    assert(!evalOne(LessThanOrEqual("d", 1.0), cellD(1.25)))
    assert(evalOne(In("id", Array(1L, 5L, 9L)), cellL(5)))
    assert(!evalOne(In("id", Array(1L, 9L)), cellL(5)))
  }

  test("string operators use UTF8 binary order and containment") {
    assert(evalOne(StringStartsWith("s", "ab"), cellS("abc")))
    assert(!evalOne(StringStartsWith("s", "b"), cellS("abc")))
    assert(evalOne(StringEndsWith("s", "bc"), cellS("abc")))
    assert(evalOne(StringContains("s", "b"), cellS("abc")))
    assert(evalOne(GreaterThan("s", "abb"), cellS("abc")))
  }

  test("null predicates") {
    assert(evalOne(IsNull("id"), null))
    assert(!evalOne(IsNull("id"), cellL(1)))
    assert(evalOne(IsNotNull("id"), cellL(1)))
    assert(!evalOne(IsNotNull("id"), null))
    assert(evalOne(EqualNullSafe("id", null.asInstanceOf[Any]), null))
    assert(!evalOne(EqualNullSafe("id", null.asInstanceOf[Any]), cellL(1)))
  }

  test("Not, Or (same column), And (splits into bounds)") {
    assert(evalOne(Not(EqualTo("id", 5L)), cellL(6)))
    assert(!evalOne(Not(EqualTo("id", 5L)), cellL(5)))
    val orF = Or(EqualTo("id", 1L), EqualTo("id", 2L))
    assert(evalOne(orF, cellL(2)))
    assert(!evalOne(orF, cellL(3)))
    // Or across different columns cannot bind to one column
    assert(FilterEval.bind(Or(EqualTo("id", 1L), EqualTo("s", "x")),
      schema, leafIdx).isEmpty)
    // And splits; unbindable side contributes nothing (over-approximation)
    val bounds = FilterEval.bind(
      And(EqualTo("id", 5L), EqualTo("s", "x")), schema, leafIdx)
    assert(bounds.length == 2)
  }
}
