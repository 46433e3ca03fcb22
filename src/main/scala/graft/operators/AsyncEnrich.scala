package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, Future}

/** Async per-record I/O (ref: AsyncDataStream.orderedWait:103 /
  * AsyncFunction.java): overlap up to `parallelism` in-flight futures
  * per partition while preserving input order — the pattern for lookup
  * joins against external services. Runs inside mapPartitions so the
  * async client and its pool are created once per partition (per task),
  * never serialized from the driver.
  */
object AsyncEnrich {

  def mapAsyncOrdered[T, U: Encoder](
      ds: Dataset[T],
      parallelism: Int,
      timeout: Duration
  )(f: T => Future[U]): Dataset[U] =
    ds.mapPartitions { it =>
      new Iterator[U] {
        private val inFlight = mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (inFlight.size < parallelism && it.hasNext) inFlight.enqueue(f(it.next()))
        override def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        override def next(): U = { fill(); Await.result(inFlight.dequeue(), timeout) }
      }
    }
}
