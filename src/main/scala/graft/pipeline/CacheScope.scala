package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped caching for the pipeline operators' diamond-shaped intermediates
  * (a gram/signature table feeding both sides of a self-join).
  *
  * A bare `.persist()` is correct for a one-shot driver run but LEAKS in a
  * long-lived session: the CacheManager holds the blocks until someone
  * calls unpersist, and the operator has no safe place to do so — the
  * returned DataFrame is lazy, so releasing before the caller's action
  * would forfeit the reuse the persist exists for.
  *
  * [[autoRelease]] keeps the persist (laziness and lineage-based fault
  * tolerance intact — unlike a localCheckpoint, a lost block recomputes)
  * and registers a ONE-SHOT QueryExecutionListener: the first completed
  * action whose plan contains the cached subtree unpersists it and
  * deregisters itself. The diamond closes inside a single returned plan,
  * so the first consuming action is provably past the reuse window; a
  * second action on the same result simply recomputes through lineage.
  *
  * An unconsumed result never materializes blocks (persist is lazy), so
  * the worst case for an abandoned DataFrame is a CacheManager metadata
  * entry, not storage.
  */
object CacheScope {

  // live listeners per session, for tests/diagnostics
  private val pending = new ConcurrentHashMap[AnyRef, QueryExecutionListener]()

  def pendingCount: Int = pending.size()

  /** @param consumingActions how many completed actions must touch the
    *   cached subtree before release — operators that run an internal
    *   action (a totals collect) before the caller's final consumption
    *   pass 2 so the reuse window stays open across both.
    */
  def autoRelease(df: DataFrame, consumingActions: Int = 1): DataFrame = {
    val p = df.persist()
    val spark = p.sparkSession
    val key = p.queryExecution.analyzed
    val token = new Object
    val remaining = new java.util.concurrent.atomic.AtomicInteger(
      math.max(1, consumingActions))
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def consumed(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(_.sameResult(key))
        catch { case _: Throwable => false }
      private def release(qe: QueryExecution): Unit =
        if (consumed(qe) && remaining.decrementAndGet() <= 0 &&
            pending.remove(token) != null) {
          try p.unpersist()
          catch { case _: Throwable => () }
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = release(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = release(qe)
    }
    pending.put(token, listener)
    spark.listenerManager.register(listener)
    p
  }
}
