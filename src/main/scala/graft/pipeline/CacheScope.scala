package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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
  * and arms a QueryExecutionListener: a completed action whose plan
  * contains the cached subtree counts as a consumption, and when the
  * expected consumptions are spent the cache unpersists and the listener
  * deregisters. The diamond closes inside a single returned plan, so the
  * consuming action is provably past the reuse window; a later action on
  * the same result simply recomputes through lineage.
  *
  * Spark's CacheManager caches and uncaches by PLAN EQUIVALENCE, so two
  * back-to-back calls to the same operator over the same input share ONE
  * cache entry — and their consuming actions are indistinguishable by
  * plan. Scopes over equivalent plans therefore MERGE: one listener per
  * canonical plan, expected consumptions summed, release fired only when
  * every registered scope's consumer has acted. An earlier scope's
  * release can no longer kill a sibling run's identical cache mid-flight.
  *
  * An unconsumed result never materializes blocks (persist is lazy), so
  * the worst case for an abandoned DataFrame is a CacheManager metadata
  * entry plus its armed listener; [[maxPending]] bounds those — past the
  * cap the OLDEST armed entry is force-released (by then it has survived
  * `maxPending` younger registrations unconsumed: abandoned).
  */
object CacheScope {

  private val maxPending = 512

  private class Entry(
      val spark: org.apache.spark.sql.SparkSession,
      val key: LogicalPlan) {
    var listener: QueryExecutionListener = _
    var remaining: Int = 0
    val fires: mutable.Buffer[() => Unit] = mutable.Buffer.empty
  }

  // armed entries, insertion-ordered (eldest first, for cap eviction),
  // keyed by canonical plan
  private val entries =
    new java.util.LinkedHashMap[LogicalPlan, Entry]()
  private val lock = new Object

  def pendingCount: Int = lock.synchronized(entries.size())

  /** Harness mode: Bench/Verify RETAIN (plain persist) and release with
    * their own clearCache after each gate; long-lived library sessions
    * keep the auto-release.
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
    registerScope(trigger.sparkSession, trigger.queryExecution.analyzed,
      consumingActions = 1, fire = release)
  }

  /** @param consumingActions how many completed actions must touch the
    *   cached subtree before release — operators that run an internal
    *   action (a totals collect) before the caller's final consumption
    *   pass 2 so the reuse window stays open across both.
    */
  def autoRelease(df: DataFrame, consumingActions: Int = 1): DataFrame = {
    if (retainAll) return df.persist()
    val p = df.persist()
    registerScope(p.sparkSession, p.queryExecution.analyzed,
      consumingActions, fire = () => p.unpersist())
    p
  }

  /** Remove the entry (already absent is a no-op) and run its releases. */
  private def expire(canonical: LogicalPlan): Unit = {
    val fires: Seq[() => Unit] = lock.synchronized {
      Option(entries.remove(canonical)).map { e =>
        e.spark.listenerManager.unregister(e.listener)
        e.fires.toSeq
      }.getOrElse(Nil)
    }
    fires.foreach(f => try f() catch { case _: Throwable => () })
  }

  private def registerScope(
      spark: org.apache.spark.sql.SparkSession,
      key: LogicalPlan,
      consumingActions: Int,
      fire: () => Unit): Unit = {
    val canonical = key.canonicalized
    val evict: Option[LogicalPlan] = lock.synchronized {
      val existing = entries.get(canonical)
      if (existing != null) {
        existing.remaining += math.max(1, consumingActions)
        existing.fires += fire
        None
      } else {
        val e = new Entry(spark, key)
        e.remaining = math.max(1, consumingActions)
        e.fires += fire
        e.listener = new QueryExecutionListener {
          private def consumed(qe: QueryExecution): Boolean =
            try qe.analyzed.exists(_.sameResult(key))
            catch { case _: Throwable => false }
          private def onAction(qe: QueryExecution): Unit = {
            val done = consumed(qe) && lock.synchronized {
              val cur = entries.get(canonical)
              if (cur eq e) { cur.remaining -= 1; cur.remaining <= 0 }
              else false
            }
            if (done) expire(canonical)
          }
          override def onSuccess(funcName: String, qe: QueryExecution,
                                 durationNs: Long): Unit = onAction(qe)
          override def onFailure(funcName: String, qe: QueryExecution,
                                 exception: Exception): Unit = onAction(qe)
        }
        entries.put(canonical, e)
        spark.listenerManager.register(e.listener)
        if (entries.size() > maxPending)
          Some(entries.keySet().iterator().next())
        else None
      }
    }
    evict.foreach(expire)
  }
}
