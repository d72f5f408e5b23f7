package graft.spark

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.format.{ByteBuf, CorruptColumnFileException, Cursor, Varint}

/** Typed view over the untyped byte-cell storage.
  *
  * The storage format is schema-less — cells are raw byte strings and
  * interpretation is the caller's job (reference: the per-column format
  * characters of tools/columnfile-cat.cc:285-319, which memcpy little-endian
  * fixed-width values). This codec is the Spark-native version of that
  * contract: every Catalyst leaf type has a deterministic byte encoding,
  * little-endian fixed width for numerics exactly like the reference's
  * `H I Q d f h i q s x` table, UTF-8 for strings, raw for binary.
  * Variable-size nested values (arrays/maps/inner structs) are framed with
  * varints from the same codec the file format uses.
  */
object CellCodec {

  /** One physical column of the flattened schema.
    *
    * Nested structs are shredded into one physical column per leaf (the
    * Spark equivalent of the reference's nested-message shredding,
    * src/columnfile-capnp.cc:50-155: struct = sum of fields). A nullable
    * struct additionally gets a 1-byte presence column so `null struct`
    * and `struct of all nulls` stay distinguishable.
    */
  final case class Leaf(path: Seq[String], dataType: DataType, presence: Boolean) {
    def name: String = path.mkString(".")
  }

  /** Flatten a logical schema into physical leaf columns, in column-index
    * order. Ordinal i of the result is physical column index i.
    */
  def flatten(schema: StructType): IndexedSeq[Leaf] = {
    val out = IndexedSeq.newBuilder[Leaf]
    def walk(prefix: Seq[String], st: StructType): Unit =
      st.fields.foreach { f =>
        val p = prefix :+ f.name
        f.dataType match {
          case inner: StructType =>
            if (f.nullable) out += Leaf(p, BooleanType, presence = true)
            walk(p, inner)
          case dt =>
            out += Leaf(p, dt, presence = false)
        }
      }
    walk(Nil, schema)
    out.result()
  }

  // ---- scalar encode ----

  /** Encode one non-null Catalyst value of `dt` to its cell bytes. */
  def encode(dt: DataType, v: Any): Array[Byte] = dt match {
    case StringType  => v.asInstanceOf[UTF8String].getBytes
    case BinaryType  => v.asInstanceOf[Array[Byte]]
    case LongType | TimestampType | TimestampNTZType =>
      le(8).putLong(asLong(v)).array()
    case IntegerType | DateType => le(4).putInt(asInt(v)).array()
    case DoubleType  => le(8).putDouble(v.asInstanceOf[Double]).array()
    case FloatType   => le(4).putFloat(v.asInstanceOf[Float]).array()
    case ShortType   => le(2).putShort(v.asInstanceOf[Short]).array()
    case ByteType    => Array(v.asInstanceOf[Byte])
    case BooleanType => Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
    case d: DecimalType =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue().toByteArray
    case _: VariantType =>
      // the open-schema leaf the reference's capnp shredder TODOs
      // (columnfile-capnp.cc:96,205 "unions not supported"): Spark's
      // VariantType stores as its two binary parts, varint-framed
      val vv = v.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
      val buf = new ByteBuf(32)
      Varint.put(buf, vv.getValue.length.toLong)
      buf.append(vv.getValue)
      Varint.put(buf, vv.getMetadata.length.toLong)
      buf.append(vv.getMetadata)
      buf.toArray
    case _ =>
      val buf = new ByteBuf(32)
      writeFramed(dt, v, buf)
      buf.toArray
  }

  /** Decode cell bytes back to the Catalyst value for `dt`.
    *
    * Integer and float families accept NARROWER cells than the read
    * type (int8/16/32 under an int64 read schema; float under double):
    * cells are fixed-width LE, so the width identifies the written
    * type unambiguously and widening reads old files after an
    * int32→int64 / float→double schema evolution — the same
    * caller-chooses-interpretation contract as the reference's
    * per-column format characters (tools/columnfile-cat.cc:285-319).
    * Narrowing (wider cell than the read type) stays an error.
    */
  def decode(dt: DataType, bytes: Array[Byte]): Any = dt match {
    case StringType  => UTF8String.fromBytes(bytes)
    case BinaryType  => bytes
    case LongType => bytes.length match {
      case 8 => rd(bytes, 8).getLong
      case 4 => rd(bytes, 4).getInt.toLong
      case 2 => rd(bytes, 2).getShort.toLong
      case 1 => bytes(0).toLong
      case _ => rd(bytes, 8).getLong // throws the standard width error
    }
    case TimestampType | TimestampNTZType => rd(bytes, 8).getLong
    case IntegerType => bytes.length match {
      case 4 => rd(bytes, 4).getInt
      case 2 => rd(bytes, 2).getShort.toInt
      case 1 => bytes(0).toInt
      case _ => rd(bytes, 4).getInt
    }
    case DateType    => rd(bytes, 4).getInt
    case DoubleType  =>
      if (bytes.length == 4) rd(bytes, 4).getFloat.toDouble
      else rd(bytes, 8).getDouble
    case FloatType   => rd(bytes, 4).getFloat
    case ShortType   =>
      if (bytes.length == 1) bytes(0).toShort else rd(bytes, 2).getShort
    case ByteType    => rd(bytes, 1).get()
    case BooleanType => rd(bytes, 1).get() != 0
    case d: DecimalType =>
      Decimal(new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale))
    case _: VariantType =>
      val cur = new Cursor(0)
      def part(): Array[Byte] = {
        // validate as Long BEFORE narrowing: a corrupt length >= 2^31
        // must raise, not truncate into a plausible small slice
        val len = Varint.get(bytes, cur)
        if (len < 0 || len > (bytes.length - cur.pos).toLong)
          throw new CorruptColumnFileException("truncated variant cell")
        val out = java.util.Arrays.copyOfRange(bytes, cur.pos, cur.pos + len.toInt)
        cur.pos += len.toInt
        out
      }
      val value = part(); val metadata = part()
      if (cur.pos != bytes.length)
        throw new CorruptColumnFileException("trailing bytes decoding variant")
      new org.apache.spark.unsafe.types.VariantVal(value, metadata)
    case _ =>
      val cur = new Cursor(0)
      val v = readFramed(dt, bytes, cur)
      if (cur.pos != bytes.length)
        throw new CorruptColumnFileException(s"trailing bytes decoding $dt")
      v
  }

  private def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
  private def rd(bytes: Array[Byte], n: Int) = {
    if (bytes.length != n)
      throw new CorruptColumnFileException(
        s"cell has ${bytes.length} bytes, expected $n")
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
  }
  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int  => i.toLong
    case other   => other.asInstanceOf[Long]
  }
  private def asInt(v: Any): Int = v match {
    case i: Int => i
    case other  => other.asInstanceOf[Int]
  }

  // ---- framed nested encode (arrays, maps, structs inside arrays) ----

  private def writeFramed(dt: DataType, v: Any, out: ByteBuf): Unit = dt match {
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      Varint.put(out, n.toLong)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) out.addByte(0)
        else { out.addByte(1); writeElement(et, arr.get(i, et), out) }
        i += 1
      }
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[MapData]
      val n = m.numElements()
      Varint.put(out, n.toLong)
      var i = 0
      while (i < n) {
        writeElement(kt, m.keyArray().get(i, kt), out)
        if (m.valueArray().isNullAt(i)) out.addByte(0)
        else { out.addByte(1); writeElement(vt, m.valueArray().get(i, vt), out) }
        i += 1
      }
    case st: StructType =>
      val row = v.asInstanceOf[InternalRow]
      var i = 0
      while (i < st.fields.length) {
        val f = st.fields(i)
        if (row.isNullAt(i)) out.addByte(0)
        else { out.addByte(1); writeElement(f.dataType, row.get(i, f.dataType), out) }
        i += 1
      }
    case other =>
      throw new UnsupportedOperationException(s"columnfile: unsupported type $other")
  }

  private def writeElement(dt: DataType, v: Any, out: ByteBuf): Unit = dt match {
    case ArrayType(_, _) | MapType(_, _, _) | _: StructType =>
      writeFramed(dt, v, out)
    case _ =>
      val bytes = encode(dt, v)
      dt match {
        case StringType | BinaryType | _: DecimalType | _: VariantType =>
          Varint.put(out, bytes.length.toLong)
        case _ => // fixed width: no length prefix
      }
      out.append(bytes)
  }

  /** Element count of a framed collection, validated as a Long BEFORE
    * narrowing: each element costs >= 1 byte, so a count beyond the
    * remaining bytes is corrupt — this both preserves the corrupt-file
    * error class for counts >= 2^31 (which would narrow negative) and
    * refuses giant pre-allocations for fabricated counts.
    */
  private def readCount(data: Array[Byte], cur: Cursor): Int = {
    val n = Varint.get(data, cur)
    if (n < 0 || n > (data.length - cur.pos).toLong)
      throw new CorruptColumnFileException(s"corrupt framed count $n")
    n.toInt
  }

  private def readFramed(dt: DataType, data: Array[Byte], cur: Cursor): Any = dt match {
    case ArrayType(et, _) =>
      val n = readCount(data, cur)
      val values = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (readByte(data, cur) != 0) values(i) = readElement(et, data, cur)
        i += 1
      }
      new GenericArrayData(values)
    case MapType(kt, vt, _) =>
      val n = readCount(data, cur)
      val keys = new Array[Any](n)
      val values = new Array[Any](n)
      var i = 0
      while (i < n) {
        keys(i) = readElement(kt, data, cur)
        if (readByte(data, cur) != 0) values(i) = readElement(vt, data, cur)
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
    case st: StructType =>
      val values = new Array[Any](st.fields.length)
      var i = 0
      while (i < st.fields.length) {
        if (readByte(data, cur) != 0)
          values(i) = readElement(st.fields(i).dataType, data, cur)
        i += 1
      }
      new GenericInternalRow(values)
    case other =>
      throw new UnsupportedOperationException(s"columnfile: unsupported type $other")
  }

  private def readElement(dt: DataType, data: Array[Byte], cur: Cursor): Any = dt match {
    case ArrayType(_, _) | MapType(_, _, _) | _: StructType =>
      readFramed(dt, data, cur)
    case StringType | BinaryType | _: DecimalType | _: VariantType =>
      val len = readCount(data, cur) // Long-validated before narrowing
      val bytes = java.util.Arrays.copyOfRange(data, cur.pos, cur.pos + len)
      cur.pos += len
      decode(dt, bytes)
    case _ =>
      val n = fixedWidth(dt)
      if (cur.pos + n > data.length)
        throw new CorruptColumnFileException("truncated framed element")
      val bytes = java.util.Arrays.copyOfRange(data, cur.pos, cur.pos + n)
      cur.pos += n
      decode(dt, bytes)
  }

  private def fixedWidth(dt: DataType): Int = dt match {
    case LongType | TimestampType | TimestampNTZType | DoubleType => 8
    case IntegerType | DateType | FloatType                       => 4
    case ShortType                                                => 2
    case ByteType | BooleanType                                   => 1
    case other =>
      throw new UnsupportedOperationException(s"columnfile: unsupported type $other")
  }

  private def readByte(data: Array[Byte], cur: Cursor): Int = {
    if (cur.pos >= data.length)
      throw new CorruptColumnFileException("truncated framed element")
    val b = data(cur.pos) & 0xff
    cur.pos += 1
    b
  }

  // ---- row <-> flat cells ----

  /** Extract the flattened cell values of one row, in leaf order. Returns
    * null entries for NULL cells.
    */
  def shred(schema: StructType, leaves: IndexedSeq[Leaf], row: InternalRow): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](leaves.length)
    var idx = 0
    def walk(st: StructType, r: InternalRow, present: Boolean): Unit = {
      var i = 0
      while (i < st.fields.length) {
        val f = st.fields(i)
        f.dataType match {
          case inner: StructType =>
            val childPresent = present && !r.isNullAt(i)
            if (f.nullable) {
              out(idx) =
                if (!present) null
                else Array(if (childPresent) 1.toByte else 0.toByte)
              idx += 1
            }
            val childRow =
              if (childPresent) r.getStruct(i, inner.fields.length) else null
            walk(inner, childRow, childPresent)
          case dt =>
            out(idx) =
              if (!present || r.isNullAt(i)) null
              else encode(dt, r.get(i, dt))
            idx += 1
        }
        i += 1
      }
    }
    walk(schema, row, present = true)
    out
  }

  /** Reassemble a Catalyst row from flattened cells (inverse of shred). */
  def assemble(schema: StructType, cells: Array[Array[Byte]]): InternalRow = {
    var idx = 0
    def walk(st: StructType): InternalRow = {
      val values = new Array[Any](st.fields.length)
      var i = 0
      while (i < st.fields.length) {
        val f = st.fields(i)
        f.dataType match {
          case inner: StructType =>
            var present = true
            if (f.nullable) {
              val p = cells(idx); idx += 1
              present = p != null && p.length == 1 && p(0) != 0
            }
            val child = walk(inner) // always consume the leaves
            values(i) = if (present) child else null
          case dt =>
            val c = cells(idx); idx += 1
            values(i) = if (c == null) null else decode(dt, c)
        }
        i += 1
      }
      new GenericInternalRow(values)
    }
    walk(schema)
  }
}
