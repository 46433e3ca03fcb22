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

  /** Unordered variant (ref: AsyncDataStream.unorderedWait:132): results
    * emit in COMPLETION order, so one slow lookup never head-of-line
    * blocks the rest of its partition — the reference's throughput mode.
    * Partition-local only; downstream order-sensitive ops must re-sort.
    */
  def mapAsyncUnordered[T, U: Encoder](
      ds: Dataset[T],
      parallelism: Int,
      timeout: Duration
  )(f: T => Future[U]): Dataset[U] =
    ds.mapPartitions { it =>
      import scala.concurrent.ExecutionContext.Implicits.global
      val done = new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, U]]()
      new Iterator[U] {
        private var inFlight = 0
        private def fill(): Unit =
          while (inFlight < parallelism && it.hasNext) {
            inFlight += 1
            f(it.next()).onComplete {
              case scala.util.Success(u) => done.put(Right(u))
              case scala.util.Failure(e) => done.put(Left(e))
            }
          }
        override def hasNext: Boolean = { fill(); inFlight > 0 }
        override def next(): U = {
          fill()
          val r = done.poll(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (r == null) throw new java.util.concurrent.TimeoutException("async enrich timed out")
          inFlight -= 1
          r.fold(e => throw e, identity)
        }
      }
    }
}
