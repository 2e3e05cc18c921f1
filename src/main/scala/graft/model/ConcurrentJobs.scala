package graft.model

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Shared daemon pool for submitting INDEPENDENT Spark actions
  * concurrently from one driver thread (review r16 #3): a streamed
  * micro-batch's cost on local[n] is dominated by job-scheduling fan —
  * k sequential actions pay k scheduling latencies even when the
  * cluster is idle — and SparkContext job submission is thread-safe by
  * contract, so independent writes of one wave can overlap. Cached
  * (unbounded) pool: callers submit a handful of coarse jobs per wave
  * and may nest one level (a write that first materializes its own
  * checkpoint), which a small fixed pool could deadlock on.
  */
private[graft] object ConcurrentJobs {
  implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-wave-writer")
        t.setDaemon(true)
        t
      }))

  /** Run every thunk concurrently on the pool; propagate the first
    * failure after all have settled (concurrently running writes are
    * overwrite-idempotent, so a partially-landed fan is repaired by
    * the caller's replay contract, not by cancellation). */
  def awaitAll(thunks: (() => Unit)*): Unit = {
    val futs = thunks.map(t => Future(t()))
    futs.foreach(f => Await.ready(f, Duration.Inf))
    futs.foreach(f => Await.result(f, Duration.Inf))
  }
}
