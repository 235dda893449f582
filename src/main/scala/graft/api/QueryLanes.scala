package graft.api

import java.util.concurrent.Semaphore
import scala.collection.concurrent.TrieMap

/** Query admission control — the engine's analog of the reference's
  * `server/.../server/QueryScheduler.java` with
  * `HiLoQueryLaningStrategy.java` / `ManualQueryLaningStrategy.java`:
  * a total concurrency capacity plus per-lane capacities, enforced by
  * NON-BLOCKING acquisition. A query that doesn't fit is rejected
  * immediately with [[QueryCapacityExceeded]] (the reference throws
  * `QueryCapacityExceededException`, surfaced as HTTP 429) rather than
  * queued — under overload, shedding beats buffering: a queued query
  * holds its caller's resources while going stale.
  *
  * Unconfigured (capacity 0) means unlimited, like a scheduler with no
  * laning strategy.
  */
object QueryLanes {

  final class QueryCapacityExceeded(msg: String)
    extends RuntimeException(msg)

  @volatile private var total: Option[Semaphore] = None
  private val lanes = TrieMap.empty[String, Semaphore]

  /** Configure total capacity and absolute per-lane capacities (the
    * manual laning strategy). Pass total <= 0 to remove all limits.
    */
  def configure(totalCapacity: Int, laneCapacities: Map[String, Int] = Map.empty): Unit =
    synchronized {
      lanes.clear()
      if (totalCapacity <= 0) { total = None }
      else {
        total = Some(new Semaphore(totalCapacity))
        laneCapacities.foreach { case (name, cap) =>
          require(cap > 0 && cap <= totalCapacity,
            s"lane $name capacity $cap outside (0, $totalCapacity]")
          lanes.put(name, new Semaphore(cap))
        }
      }
    }

  /** The HiLo strategy: one 'low' lane capped at `lowPercent` of the total;
    * unlaned queries compete only for the total.
    */
  def configureHiLo(totalCapacity: Int, lowPercent: Int): Unit = {
    require(lowPercent > 0 && lowPercent <= 100, s"bad percent $lowPercent")
    configure(totalCapacity,
      Map("low" -> math.max(1, totalCapacity * lowPercent / 100)))
  }

  /** Run `body` under admission: acquire the lane permit (if the query
    * names a configured lane) then a total permit; reject immediately if
    * either is exhausted. Permits are always released on exit.
    */
  def withAdmission[T](lane: Option[String])(body: => T): T = {
    val laneSem = lane.flatMap(lanes.get)
    laneSem.foreach { s =>
      if (!s.tryAcquire())
        throw new QueryCapacityExceeded(
          s"too many concurrent queries for lane '${lane.get}' " +
            "(reference QueryCapacityExceededException, HTTP 429)")
    }
    val totalSem = total
    try {
      totalSem.foreach { s =>
        if (!s.tryAcquire()) {
          throw new QueryCapacityExceeded(
            "total query capacity exceeded " +
              "(reference QueryCapacityExceededException, HTTP 429)")
        }
      }
      try body
      finally totalSem.foreach(_.release())
    } finally laneSem.foreach(_.release())
  }
}
