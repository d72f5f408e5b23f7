package graft.functions

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot path of the
  * dedup operators (SURVEY §2.3 extensions).
  *
  * The same math is expressible with builtin higher-order functions
  * (transform/aggregate lambdas) — and the DuckDB oracles still spell it
  * that way — but HOF lambdas evaluate interpreted, one closure call per
  * character. These expressions do the char loops in tight JVM code and
  * participate in whole-stage codegen via a static call, cutting the
  * dedup stage cost several-fold at sf0.1.
  *
  * Semantics are bit-identical to the SQL formulation over ASCII text
  * (`ascii(substring(s,i,1))` == UTF-16 code unit for BMP/ASCII input):
  * polyhash(s) = foldl (acc*31 + code) mod 2^31-1.
  */
object TextHashOps {
  final val P: Long = 2147483647L

  /** 16 fixed MinHash permutations — MUST match ExtQueries.AB. */
  final val A: Array[Long] = Array(
    1299721L, 2750161L, 4256233L, 5800079L, 7368787L, 8960453L,
    10570841L, 12195257L, 13834103L, 15485863L, 17144507L, 18815231L,
    20495843L, 22182343L, 23879519L, 25582153L)
  final val B: Array[Long] = Array(
    1299827L, 2750357L, 4256249L, 5800129L, 7368791L, 8960467L,
    10570849L, 12195263L, 13834109L, 15485867L, 17144521L, 18815233L,
    20495857L, 22182349L, 23879539L, 25582171L)

  def polyHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % P
      i += 1
    }
    acc
  }

  def polyHashU(s: UTF8String): Long = polyHash(s.toString)

  /** Hashes of the 3-word shingles of `text` (split on single spaces,
    * empties preserved — matches `split(text, ' ')`). `distinct` keeps
    * first occurrences only.
    */
  def shingleHashes(text: UTF8String, distinct: Boolean): ArrayData = {
    val w = text.toString.split(" ", -1)
    if (w.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val n = w.length - 2
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = polyHash(w(i) + " " + w(i + 1) + " " + w(i + 2))
      i += 1
    }
    new GenericArrayData(if (distinct) dedup(out) else out)
  }

  /** Distinct hashes of the character n-grams of `text`. */
  def gramHashes(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    if (s.length < n) return new GenericArrayData(Array.emptyLongArray)
    val m = s.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = i
      while (j < i + n) {
        acc = (acc * 31 + s.charAt(j)) % P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(dedup(out))
  }

  /** 16-element MinHash signature of a hash set. */
  def minHashSig(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val sig = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hashes.getLong(i)
      var k = 0
      while (k < 16) {
        val h = (A(k) * x + B(k)) % P
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Shingle-level 31-bit SimHash of a (multiplicity-preserving) hash list. */
  def simHash31(hashes: ArrayData): Long = {
    val counts = new Array[Int](31)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 31) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 31) {
      if (counts(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  private def dedup(xs: Array[Long]): Array[Long] = {
    val seen = new java.util.HashSet[java.lang.Long](xs.length * 2)
    val out = new Array[Long](xs.length)
    var n = 0
    var i = 0
    while (i < xs.length) {
      if (seen.add(xs(i))) { out(n) = xs(i); n += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }
}

abstract class TextHashUnary extends UnaryExpression {
  /** Java expression applied to the evaluated child in codegen. */
  protected def staticCall(input: String): String
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall(c))
}

case class PolyHash(child: Expression) extends TextHashUnary {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.polyHashU(input.asInstanceOf[UTF8String])
  protected def staticCall(c: String) =
    s"graft.functions.TextHashOps.polyHashU($c)"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class ShingleHashes(child: Expression, distinct: Boolean) extends TextHashUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.shingleHashes(input.asInstanceOf[UTF8String], distinct)
  protected def staticCall(c: String) =
    s"graft.functions.TextHashOps.shingleHashes($c, $distinct)"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class GramHashes(child: Expression, n: Int) extends TextHashUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.gramHashes(input.asInstanceOf[UTF8String], n)
  protected def staticCall(c: String) =
    s"graft.functions.TextHashOps.gramHashes($c, $n)"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class MinHashSig(child: Expression) extends TextHashUnary {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.minHashSig(input.asInstanceOf[ArrayData])
  protected def staticCall(c: String) =
    s"graft.functions.TextHashOps.minHashSig($c)"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class SimHash31(child: Expression) extends TextHashUnary {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHashOps.simHash31(input.asInstanceOf[ArrayData])
  protected def staticCall(c: String) =
    s"graft.functions.TextHashOps.simHash31($c)"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** SQL registration: makes the expressions callable from the shared SQL
  * query texts (`graft_*` functions).
  */
object TextHashFunctions {
  // Deterministic singleton builders: re-registering is always a no-op
  // semantically, so skip when present instead of replace — a second
  // registrar (e.g. a streaming query sharing the session with
  // Tables.registerAll) must not emit a `replaced a previously
  // registered function` warning per function per run.
  private def registerOnce(registry: FunctionRegistry, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "built-in")

  def register(registry: FunctionRegistry): Unit = {
    registerOnce(registry, "graft_polyhash")(e => PolyHash(e.head))
    registerOnce(registry, "graft_shingle_hashes")(
      e => ShingleHashes(e.head, distinct = true))
    registerOnce(registry, "graft_shingle_hashes_all")(
      e => ShingleHashes(e.head, distinct = false))
    registerOnce(registry, "graft_gram_hashes")(e => GramHashes(e.head, 5))
    registerOnce(registry, "graft_minhash_sig")(e => MinHashSig(e.head))
    registerOnce(registry, "graft_simhash31")(e => SimHash31(e.head))
  }
}
