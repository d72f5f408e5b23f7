package graft.functions

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product for the embedding operators (v01–v05, d07).
  *
  * Replaces the HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), CAST(0 AS DOUBLE), (acc,v) -> acc + v)` on the Spark side
  * — the DuckDB oracles keep the lambda spelling. HOF lambdas evaluate
  * interpreted (one closure call per dimension per pair); this loop is
  * tight JVM code inside whole-stage codegen.
  *
  * Bit-identical to the SQL form: elements widen to double exactly as
  * CAST does, products accumulate LEFT TO RIGHT in index order (IEEE
  * addition order fixed — the determinism rule every embedding query
  * relies on), mismatched lengths and null elements yield NULL exactly
  * like zip_with's null padding flowing through the fold, and empty
  * arrays yield the 0.0 seed.
  */
object VectorOps {

  /** elemCode: 0 = float elements, 1 = double elements. Returns null for
    * length mismatch or null elements (the zip_with/aggregate contract).
    */
  def dotBoxed(a: ArrayData, b: ArrayData, ac: Int, bc: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (ac == 0) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bc == 0) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Exact integer dot product; elemCode 0/1/2/3 = byte/short/int/long
    * elements. Null on length mismatch or null elements, like the
    * zip_with + aggregate spelling it replaces. Integer addition is
    * associative, so (unlike the float path) no summation-order caveat
    * is even needed for engine portability.
    */
  def intDotBoxed(a: ArrayData, b: ArrayData, ac: Int, bc: Int): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = ac match {
        case 0 => a.getByte(i).toLong
        case 1 => a.getShort(i).toLong
        case 2 => a.getInt(i).toLong
        case _ => a.getLong(i)
      }
      val y = bc match {
        case 0 => b.getByte(i).toLong
        case 1 => b.getShort(i).toLong
        case 2 => b.getInt(i).toLong
        case _ => b.getLong(i)
      }
      acc += x * y
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_dot requires array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemCode(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _)  => 0
    case ArrayType(DoubleType, _) => 1
    case other => throw new IllegalArgumentException(
      s"graft_dot: unsupported input type $other (need array<float|double>)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemCode(left), elemCode(right))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorOps.dotBoxed(
         |  $a, $b, ${elemCode(left)}, ${elemCode(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over integral arrays (tinyint through
  * bigint) — the scoring kernel for the int8-quantized embedding path
  * (v07, and d07's candidate scoring). Accumulates in long; inputs are
  * quantized to |q| <= 127, so 64-dim products are far from overflow.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _                                                           => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_idot requires integral array inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemCode(e: Expression): Int = e.dataType match {
    case ArrayType(ByteType, _)    => 0
    case ArrayType(ShortType, _)   => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _)    => 3
    case other => throw new IllegalArgumentException(
      s"graft_idot: unsupported input type $other (need integral array)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.intDotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemCode(left), elemCode(right))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("idotRes")
      s"""
         |java.lang.Long $tmp = graft.functions.VectorOps.intDotBoxed(
         |  $a, $b, ${elemCode(left)}, ${elemCode(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  // Same skip-if-present discipline as TextHashFunctions: deterministic
  // builders, so a second registrar in the session is a silent no-op.
  private def registerOnce(registry: FunctionRegistry, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "built-in")

  def register(registry: FunctionRegistry): Unit = {
    registerOnce(registry, "graft_dot") { e =>
      if (e.length != 2) throw new IllegalArgumentException(
        s"graft_dot takes exactly 2 arguments, got ${e.length}")
      DotProduct(e(0), e(1))
    }
    registerOnce(registry, "graft_idot") { e =>
      if (e.length != 2) throw new IllegalArgumentException(
        s"graft_idot takes exactly 2 arguments, got ${e.length}")
      IntDotProduct(e(0), e(1))
    }
  }
}
