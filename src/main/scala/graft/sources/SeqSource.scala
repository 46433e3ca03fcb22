package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector — the user-extension surface the
  * reference exposes through `SourceFunction` / `RichParallelSourceFunction`
  * (ref flink-streaming-java `SourceFunction.java:30`,
  * `FromElementsFunction`, the rate-limited generator sources every
  * connector tutorial starts from). Spark's extension point is the
  * connector API, so this implements it end to end: a deterministic
  * sequence generator `(id BIGINT, payload STRING)` with
  * `payload = md5(id)` that serves
  *
  *  - BATCH reads: `partitions` parallel range splits over `rows` ids
  *    (each reader is an independent range — no driver data, no
  *    shuffle, the same split discipline a real connector needs);
  *  - MICRO-BATCH reads: offsets advance `rowsPerBatch` ids per
  *    trigger (the rate-limited replay shape), with
  *    `SupportsTriggerAvailableNow` so Trigger.AvailableNow drains the
  *    remaining range in deterministic batch steps.
  *
  * Content is pure arithmetic on the id, so a DuckDB oracle replays
  * the source exactly — which is the point: the connector machinery
  * (provider → table → scan → partitions → readers, offset
  * serialization, commit) is the artifact under test, not the data.
  *
  * Options: `rows` (total ids, default 1000), `partitions` (batch
  * split count, default 4), `rowsPerBatch` (streaming step, default
  * 1000).
  */
final class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SeqTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerBatch", 1000L))
  }
}

object SeqSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  private[sources] def payload(id: Long): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    UTF8String.fromString(hex)
  }

  private[sources] def splits(start: Long, end: Long, n: Int): Seq[(Long, Long)] = {
    val total = math.max(0L, end - start)
    val per = math.max(1L, (total + n - 1) / n)
    (start until end by per).map(s => (s, math.min(end, s + per)))
  }
}

private final class SeqTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SeqSource.Schema
        override def toBatch: Batch = new SeqBatch(0L, rows, partitions)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SeqMicroBatchStream(rows, partitions, rowsPerBatch)
      }
    }
}

private final case class SeqRange(start: Long, end: Long) extends InputPartition

private final class SeqBatch(start: Long, end: Long, partitions: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    SeqSource.splits(start, end, partitions).map { case (s, e) => SeqRange(s, e) }.toArray
  override def createReaderFactory(): PartitionReaderFactory = new SeqReaderFactory
}

private final class SeqReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SeqRange(start, end) = partition.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = start - 1
      override def next(): Boolean = { cur += 1; cur < end }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](cur, SeqSource.payload(cur)))
      override def close(): Unit = ()
    }
  }
}

/** Long offset = "all ids below this are emitted". Advancing it by
  * `rowsPerBatch` per `latestOffset` call is the rate-limited replay;
  * AvailableNow keeps asking until the prepared end is reached.
  */
private final case class SeqOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private final class SeqMicroBatchStream(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  @volatile private var known = 0L
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = SeqOffset(0L)
  // admission-control form: one rowsPerBatch step past the committed
  // offset per trigger — the rate-limited replay contract
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    known = math.min(rows, start.asInstanceOf[SeqOffset].n + rowsPerBatch)
    SeqOffset(known)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control source: latestOffset(start, limit) is the entry point")
  override def reportLatestOffset(): Offset = SeqOffset(known)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SeqSource.splits(start.asInstanceOf[SeqOffset].n, end.asInstanceOf[SeqOffset].n,
      partitions).map { case (s, e) => SeqRange(s, e) }.toArray
  override def createReaderFactory(): PartitionReaderFactory = new SeqReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
