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

  /** Harness mode: Spark's CacheManager unpersists by PLAN EQUIVALENCE,
    * so an async release from run A can kill run B's freshly-registered
    * equivalent cache mid-flight — exactly the 3.7 s → 40 s
    * clear-during-run trap SCALING.md documents. Bench/Verify therefore
    * RETAIN (plain persist) and release with their own clearCache after
    * each gate; long-lived library sessions keep the auto-release.
    */
  @volatile var retainAll: Boolean = false

  /** Release an OLDER resource when `trigger`'s plan is first consumed —
    * for operators whose cached input is provably dead once their
    * (checkpointed) output is read, but where an EAGER unpersist at
    * build time would invalidate sibling cache registrations mid-build
    * (CacheManager's uncache re-registers dependents, and plans already
    * analyzed against the old InMemoryRelation lose their reuse — the
    * q_pipeline_e2e 3.8 s → 35 s bisect). Harness mode skips: clearCache
    * after each gate owns the lifecycle there.
    */
  def releaseOnConsumption(trigger: DataFrame, release: () => Unit): Unit = {
    if (retainAll) return
    val spark = trigger.sparkSession
    val key = trigger.queryExecution.analyzed
    val token = new Object
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def consumed(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(_.sameResult(key))
        catch { case _: Throwable => false }
      private def fire(qe: QueryExecution): Unit =
        if (consumed(qe) && pending.remove(token) != null) {
          try release()
          catch { case _: Throwable => () }
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = fire(qe)
    }
    pending.put(token, listener)
    spark.listenerManager.register(listener)
  }

  /** @param consumingActions how many completed actions must touch the
    *   cached subtree before release — operators that run an internal
    *   action (a totals collect) before the caller's final consumption
    *   pass 2 so the reuse window stays open across both.
    */
  def autoRelease(df: DataFrame, consumingActions: Int = 1): DataFrame = {
    if (retainAll) return df.persist()
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
