package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the shred/assemble cell codec over randomized rows
  * of nested schemas (struct-in-struct with presence bytes, arrays with
  * null elements, maps, framed variable-width leaves). Uses ScalaCheck
  * generators with a fixed seed (scalatestplus isn't in the offline
  * dependency cache, so sampling is driven manually).
  */
class CellCodecPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i =>
      g.apply(params, rng.Seed(42L + i)))
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("st", StructType(Seq(
      StructField("a", IntegerType, nullable = true),
      StructField("inner", StructType(Seq(
        StructField("b", DoubleType, nullable = true))), nullable = true)
    )), nullable = true),
    StructField("arr", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("sarr", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("m", MapType(StringType, LongType, valueContainsNull = true),
      nullable = true),
    StructField("bin", BinaryType, nullable = true)))

  private val leaves = CellCodec.flatten(schema)

  private val genStr: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.asciiPrintableStr.map(s => UTF8String.fromString(s.take(30))))
  private val genInner: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.option(Gen.chooseNum(-1e9, 1e9)).map(o =>
      new GenericInternalRow(Array[Any](o.map(d => d: java.lang.Double).orNull))))
  private val genSt: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    for {
      a <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
      inner <- genInner
    } yield new GenericInternalRow(Array[Any](a.orNull, inner)))
  private val genArr: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.listOfN(5, Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .map(xs => new GenericArrayData(
        xs.map(_.map(l => l: java.lang.Long).orNull).toArray[Any])))
  private val genSarr: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.listOfN(3, genStr).map(xs => new GenericArrayData(xs.toArray[Any])))
  private val genMap: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.listOfN(3, Gen.zip(Gen.alphaNumStr.map(_.take(8)), Gen.option(Gen.long)))
      .map { kvs =>
        val dedup = kvs.distinctBy(_._1)
        new ArrayBasedMapData(
          new GenericArrayData(dedup.map(kv => UTF8String.fromString(kv._1)).toArray[Any]),
          new GenericArrayData(dedup.map(_._2.map(l => l: java.lang.Long).orNull).toArray[Any]))
      })
  private val genBin: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.listOfN(10, Gen.chooseNum(-128, 127)).map(_.map(_.toByte).toArray))

  private val genRow: Gen[InternalRow] = for {
    id <- Gen.long
    name <- genStr
    st <- genSt
    arr <- genArr
    sarr <- genSarr
    m <- genMap
    bin <- genBin
  } yield new GenericInternalRow(Array[Any](id, name, st, arr, sarr, m, bin))

  private def render(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case r: InternalRow =>
      (0 until r.numFields).map(i => render(r.asInstanceOf[GenericInternalRow].values(i)))
        .mkString("[", ",", "]")
    case a: GenericArrayData => a.array.map(render).mkString("(", ",", ")")
    case m: ArrayBasedMapData => render(m.keyArray) + "->" + render(m.valueArray)
    case other => String.valueOf(other)
  }

  test("corrupt framed counts/lengths raise CorruptColumnFileException, never allocate") {
    import graft.format.{ByteBuf, CorruptColumnFileException, Varint}
    def cell(write: ByteBuf => Unit): Array[Byte] = {
      val b = new ByteBuf(16); write(b); b.toArray
    }
    // array count in [2^31, 2^32) — valid 32-bit varint — would narrow
    // negative without Long validation
    assertThrows[CorruptColumnFileException](CellCodec.decode(
      ArrayType(LongType), cell(b => Varint.put(b, 0xFFFFFFF5L))))
    // huge positive count: would pre-allocate gigabytes
    assertThrows[CorruptColumnFileException](CellCodec.decode(
      ArrayType(LongType), cell(b => Varint.put(b, 1L << 30))))
    // map count beyond remaining bytes
    assertThrows[CorruptColumnFileException](CellCodec.decode(
      MapType(LongType, LongType), cell(b => Varint.put(b, 100L))))
    // framed string element length >= 2^31 inside an array
    assertThrows[CorruptColumnFileException](CellCodec.decode(
      ArrayType(StringType), cell { b =>
        Varint.put(b, 1L); b.addByte(1) // one present element
        Varint.put(b, 0xFFFFFFF1L)      // its "length"
      }))
    // variant part length >= 2^31
    assertThrows[CorruptColumnFileException](CellCodec.decode(
      VariantType, cell(b => Varint.put(b, 0xFFFFFFF1L))))
  }

  test("shred -> assemble is the identity over random nested rows") {
    val rows = samples(genRow, 300)
    assert(rows.size >= 250, "generator drought")
    rows.foreach { row =>
      val cells = CellCodec.shred(schema, leaves, row)
      val back = CellCodec.assemble(schema, cells)
      assert(render(back) == render(row))
      assert(cells.length == leaves.length)
    }
  }
}
