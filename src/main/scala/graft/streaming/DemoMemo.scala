package graft.streaming

import org.apache.spark.sql.SparkSession

/** Registry over the streaming demos' per-session result memos, so the
  * BENCH can reset them between its two passes (VERDICT r14 #3): a
  * memoized demo's second run otherwise returns a DataFrame over the
  * first run's already-written output — 0.2 s against a 29 s cold
  * build — and the best-of-2 capture reports an artifact-state
  * artifact instead of the query. Each demo object registers its
  * session-keyed cache at class-init; [[reset]] drops exactly one
  * session's entries, so pass 2 re-pays precisely what pass 1 paid
  * and min/cold stay comparable across rounds. Tests and interactive
  * sessions keep the memoization (the whole point of artifact-backed
  * demos); only the measurement protocol resets. */
object DemoMemo {

  private val caches =
    new java.util.concurrent.CopyOnWriteArrayList[java.util.Map[SparkSession, _]]()

  private[streaming] def register[T](
      c: java.util.Map[SparkSession, T]): java.util.Map[SparkSession, T] = {
    caches.add(c): Unit
    c
  }

  /** Drop every registered memo entry of `spark` (other sessions'
    * entries stay). */
  def reset(spark: SparkSession): Unit =
    caches.forEach(c => c.remove(spark): Unit)
}
