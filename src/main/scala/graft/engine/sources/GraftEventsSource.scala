package graft.engine.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 streaming source — the engine-level Source SPI.
  *
  * The reference engine exposes a `Source` extension point that every
  * transport connector (HTTP, TCP, CDC, message bus) implements: deliver
  * events into the runtime with replayable positions so state recovery can
  * resume mid-stream. Spark's analog is a `TableProvider` whose scan
  * builds a [[MicroBatchStream]]: the engine asks the source for offsets,
  * plans bounded `[start, end)` splits per micro-batch, and persists the
  * committed offset in the checkpoint — restart resumes from the last
  * commit, never re-delivering a planned batch.
  *
  * This implementation replays a line-oriented event log (one CSV line per
  * event, staged time-ordered from the events table) with
  * admission-controlled batch boundaries: each trigger admits
  * `rowsPerBatch` rows (the `maxOffsetsPerTrigger` idiom), split into up
  * to `sliceCount` executor-side partitions. Offsets are plain row
  * positions — dense, totally ordered, trivially serializable — which is
  * exactly the contract object-store / log-offset transports satisfy at
  * 100 TB (a production source would also index byte offsets per split
  * boundary instead of line-skipping; the skip is O(file) per partition
  * and fine at harness scale).
  *
  * Registered via META-INF/services as format("graft").
  */
class GraftEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftEventsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // the source produces the fixed 5-column event schema; a caller's
    // readStream.schema(...) override cannot be honored, so reject a
    // mismatch at resolution instead of serving misread rows
    require(schema == GraftEventsSource.schema,
      s"graft source has a fixed schema ${GraftEventsSource.schema.simpleString}; " +
        s"got ${schema.simpleString} — drop the .schema(...) override")
    // properties arrive with the caller's original key case — normalize
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty,
      "graft source requires option(\"path\", <event log file>)")
    val rpb = Option(opts.get("rowsPerBatch")).map(_.toLong).getOrElse(1000L)
    require(rpb > 0, s"rowsPerBatch must be positive, got $rpb")
    new GraftEventsTable(path, rpb,
      Option(opts.get("limitRows")).map(_.toLong).getOrElse(Long.MaxValue))
  }
}

object GraftEventsSource {
  /** Fixed event schema (mirrors the events table's replayable columns). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_ns", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

/** `limitRows` models the upstream high-watermark: the source only admits
  * offsets up to it, the way a log transport only serves what the broker
  * holds so far (the restart spec caps a first lifetime with it, then
  * lifts the cap on the second — data "arriving" between runs). */
class GraftEventsTable(path: String, rowsPerBatch: Long, limitRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-events($path)"
  override def schema(): StructType = GraftEventsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftEventsSource.schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new GraftEventsMicroBatchStream(path, rowsPerBatch, limitRows)
      }
    }
}

/** Row-position offset: dense, totally ordered, JSON = the position. */
case class GraftOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

class GraftEventsMicroBatchStream(path: String, rowsPerBatch: Long,
                                  limitRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl {
  // total rows counted once at stream construction (driver-side line
  // count of the local staged log; a real transport reports its own
  // high-watermark offset instead)
  private lazy val totalRows: Long = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().size.toLong finally src.close()
  }
  private def available: Long = math.min(totalRows, limitRows)
  private val sliceCount = 4

  override def initialOffset(): Offset = GraftOffset(0L)

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  /** Admission control: each trigger advances at most the ReadLimit past
    * the committed start (Trigger.Once passes allAvailable and drains to
    * the high-watermark in one batch) — the controlled-batch-boundary
    * contract. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftOffset].rows
    val cap = limit match {
      case mr: ReadMaxRows => s + mr.maxRows()
      case _               => available
    }
    GraftOffset(math.min(available, cap))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def reportLatestOffset(): Offset = GraftOffset(available)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].rows
    val e = end.asInstanceOf[GraftOffset].rows
    if (e <= s) Array.empty
    else {
      val span = e - s
      val slices = math.min(sliceCount.toLong, span).toInt
      val per = span / slices
      (0 until slices).map { i =>
        val lo = s + i * per
        val hi = if (i == slices - 1) e else lo + per
        GraftInputPartition(path, lo, hi): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory

  override def commit(end: Offset): Unit = () // positions live in the log
  override def stop(): Unit = ()
}

case class GraftInputPartition(path: String, startRow: Long, endRow: Long)
    extends InputPartition

class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(p.path)
      // skip with a Long counter — drop(Int) would silently truncate the
      // split start past 2^31 lines and read the wrong range
      private val it = {
        val lines = src.getLines()
        var skipped = 0L
        while (skipped < p.startRow && lines.hasNext) {
          lines.next(); skipped += 1
        }
        lines
      }
      private var served = 0L
      private var row: InternalRow = _
      override def next(): Boolean =
        if (served >= p.endRow - p.startRow || !it.hasNext) false
        else {
          val f = it.next().split(",", -1)
          row = InternalRow(f(0).toLong, f(1).toLong, f(2).toLong,
            UTF8String.fromString(f(3)), f(4).toDouble)
          served += 1
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = src.close()
    }
  }
}
