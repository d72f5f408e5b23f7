package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container has no image/audio codecs); everything around it — schema
  * evolution, per-partition batching, partitioning behavior — is the
  * real seam where a production decoder (JNI/FFI or an Arrow-batched
  * Python worker) plugs in. At 100 TB the pattern matters more than the
  * codec: decode runs inside `mapPartitions` so each task amortizes
  * decoder init over its whole partition, and no bytes ever gather to
  * the driver.
  */
object MultimodalOps {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would parse the container header here.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, String, Boolean) = {
    if (payload == null || payload.isEmpty) (0, 0, "empty", false)
    else {
      val n = payload.length
      val b0 = payload(0) & 0xff
      val modality = (n % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      (64 + (n % 640), 64 + ((n * 31 + b0) % 480), modality, true)
    }
  }

  /** Decode/feature-extract over a binary column: batch-shaped
    * per-partition processing that appends a typed `meta` struct.
    */
  def decode(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("meta", metaSchema, nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would happen here (once per task)
      rows.map { r =>
        val (w, h, m, ok) = stubDecode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(w, h, m, ok))
      }
    }
  }

  /** Frame sampling stub for video-shaped payloads: split the payload
    * into `n` equal byte slices ("frames"). Real version: container
    * demux + keyframe extraction, same batched shape.
    */
  def frameSample(df: DataFrame, binaryCol: String, n: Int): DataFrame = {
    val slicer = udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) Array.empty[Array[Byte]]
      else {
        val step = math.max(1, payload.length / n)
        (0 until math.min(n, payload.length)).map { i =>
          val from = i * step
          java.util.Arrays.copyOfRange(payload, from,
            math.min(from + step, payload.length))
        }.toArray
      }
    }
    df.withColumn("frames", slicer(col(binaryCol)))
  }

  /** Resize stub: deterministic downsample of the byte payload (every
    * k-th byte), preserving the binary-in/binary-out decode shape.
    */
  def resize(df: DataFrame, binaryCol: String, factor: Int): DataFrame = {
    val shrink = udf { (payload: Array[Byte]) =>
      if (payload == null) null
      else payload.indices.collect { case i if i % factor == 0 => payload(i) }.toArray
    }
    df.withColumn(s"${binaryCol}_resized", shrink(col(binaryCol)))
  }
}
