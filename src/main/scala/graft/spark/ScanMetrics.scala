package graft.spark

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** Scan observability (reference operator #21 — Size()/Offset() progress,
  * columnfile.h:202-207 — upgraded to Spark's custom-metric surface):
  * per-task counters aggregated into the SQL UI.
  */
object ScanMetrics {
  final val ChunksRead = "cfChunksRead"
  final val ChunksSkipped = "cfChunksSkipped"
  final val DecodedBytes = "cfDecodedBytes"
  final val CorruptChunks = "cfCorruptChunks"

  final class ChunksReadMetric extends CustomSumMetric {
    override def name(): String = ChunksRead
    override def description(): String = "columnfile chunks decoded"
  }
  final class ChunksSkippedMetric extends CustomSumMetric {
    override def name(): String = ChunksSkipped
    override def description(): String = "columnfile chunks skipped by filters"
  }
  final class DecodedBytesMetric extends CustomSumMetric {
    override def name(): String = DecodedBytes
    override def description(): String = "columnfile bytes decoded"
  }

  final class CorruptChunksMetric extends CustomSumMetric {
    override def name(): String = CorruptChunks
    override def description(): String =
      "columnfile chunks dropped as corrupt (onCorrupt=skip)"
  }

  def all: Array[CustomMetric] =
    Array(new ChunksReadMetric, new ChunksSkippedMetric,
      new DecodedBytesMetric, new CorruptChunksMetric)

  /** Mutable per-task counters; snapshot via `current`. */
  final class Task {
    var chunksRead = 0L
    var chunksSkipped = 0L
    var decodedBytes = 0L
    var corruptChunks = 0L
    def current: Array[CustomTaskMetric] = Array(
      metric(ChunksRead, chunksRead),
      metric(ChunksSkipped, chunksSkipped),
      metric(DecodedBytes, decodedBytes),
      metric(CorruptChunks, corruptChunks))
  }

  private def metric(n: String, v: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = n
      override def value(): Long = v
    }
}
