package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Changelog/retraction handling (SURVEY §7 hard part #1; ref:
  * flink-core RowKind.java:32-55, ChangelogMode, and
  * TwoPhaseCommitSinkFunction.java for the exactly-once sink contract):
  * the reference propagates UPDATE_BEFORE/UPDATE_AFTER row kinds through
  * operator chains; Spark confines updates to the sink. The supported
  * strategy: run the stateful operator in Update mode and COLLAPSE the
  * upsert stream at the sink via foreachBatch merge — the sink-side
  * analog of ChangelogMode.upsert().
  *
  * `upsertForeachBatch` merges each micro-batch into a keyed store via
  * last-writer-wins per key — with an idempotent store this also gives
  * the exactly-once effect TwoPhaseCommitSinkFunction provides (the
  * batchId makes redelivery detectable).
  */
object ChangelogSink {

  /** Pluggable upsert target (JDBC table, KV store, delta table ...). */
  trait UpsertStore[K] extends Serializable {
    def upsert(batchId: Long, rows: Seq[(K, Row)]): Unit
  }

  /** In-memory reference store for tests/demos; replayed batches with
    * the same batchId are ignored (idempotence).
    */
  final class MemoryUpsertStore[K] extends UpsertStore[K] {
    val data = new ConcurrentHashMap[K, Row]()
    private val seen = ConcurrentHashMap.newKeySet[Long]()
    override def upsert(batchId: Long, rows: Seq[(K, Row)]): Unit = {
      if (seen.add(batchId)) rows.foreach { case (k, r) => data.put(k, r) }
    }
    def snapshot: Map[K, Row] = data.asScala.toMap
  }

  /** Attach an upsert-collapsing foreachBatch sink to an update-mode
    * stream. `keyOf` extracts the upsert key from each row.
    */
  def upsertWriter[K](
      updates: DataFrame,
      keyOf: Row => K,
      store: UpsertStore[K]
  ): DataStreamWriter[Row] =
    updates.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // collect per micro-batch: the upsert stream is already reduced
        // to one row per changed key by the stateful operator upstream
        store.upsert(batchId, batch.collect().toSeq.map(r => keyOf(r) -> r))
      }

  def runAvailableNow[K](updates: DataFrame, keyOf: Row => K, store: UpsertStore[K]): Unit = {
    val q: StreamingQuery = upsertWriter(updates, keyOf, store)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
