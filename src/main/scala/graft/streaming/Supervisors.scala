package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.concurrent.TrieMap

/** Supervisor lifecycle for streaming ingest — the engine's analog of the
  * reference's supervisor API (`indexing-service/.../supervisor/
  * SupervisorManager.java`, `SupervisorResource.java`; REST surface
  * documented in `docs/api-reference/supervisor-api.md`): submit a spec,
  * then suspend / resume / terminate it and poll status.
  *
  * The reference supervisor owns Kafka consumption tasks and commits
  * offsets atomically with segment publishes; here the Structured Streaming
  * checkpoint IS that ledger — suspend stops the query but keeps the
  * checkpoint, so resume continues exactly after the last durable batch
  * (no replay, no loss — the exactly-once property StreamingSpec pins for
  * the appenderator). Terminate forgets the supervisor entry; the
  * checkpoint directory outlives it the same way a terminated Druid
  * supervisor's published segments do.
  *
  * State machine mirrors the reference's generic states
  * (`SupervisorStateManager`): PENDING → RUNNING → SUSPENDED ⇄ RUNNING →
  * STOPPING/terminated.
  */
object Supervisors {

  /** A streaming-ingest spec: file-source stand-in for the reference's
    * Kafka/Kinesis ioConfig (swap `sourcePath` for a Kafka `readStream`
    * when the connector jar is present), rollup dataSchema, parquet sink.
    */
  final case class SupervisorSpec(
      id: String,
      sourcePath: String,
      schema: StructType,
      timeCol: String,
      granularity: String,
      dims: Seq[String],
      outPath: String,
      checkpointPath: String)

  sealed trait State
  case object Pending extends State
  case object Running extends State
  case object Suspended extends State
  case object Stopping extends State
  case object Unhealthy extends State

  final case class Status(id: String, state: State, batchesCompleted: Long,
                          healthy: Boolean = true,
                          error: Option[String] = None)

  /** `batches` is a HIGH-WATER MARK of the checkpoint-cumulative batch
    * counter, not an accumulator: `batchId` continues from the retained
    * checkpoint across suspend/resume, so adding the counter at each
    * suspend would double-count every pre-suspend batch on the next cycle.
    */
  private final case class Entry(spec: SupervisorSpec,
      var query: Option[org.apache.spark.sql.streaming.StreamingQuery],
      var state: State, var batches: Long,
      var error: Option[String] = None)

  private val registry = TrieMap.empty[String, Entry]

  /** Batches completed so far in the CURRENT run: batchId is the
    * checkpoint-scoped cumulative counter, unlike recentProgress which is
    * capped at spark.sql.streaming.numRecentProgressUpdates entries.
    */
  private def completedBatches(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    Option(q.lastProgress).map(_.batchId + 1L).getOrElse(0L)

  private def ingestStream(spark: SparkSession, spec: SupervisorSpec): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = graft.Tables.normalizeTs(
      StreamingIngest.source(spark, spec.sourcePath, spec.schema))
    // append-mode rollup: watermark-closed buckets emit once, the shape a
    // durable file sink requires (complete mode would rewrite history).
    // Append mode needs the WINDOW STRUCT itself as a grouping column to
    // keep the event-time watermark linkage — project `start` only after
    // the aggregate (extracting it inside groupBy severs the linkage and
    // Spark rejects the plan).
    raw.withWatermark(spec.timeCol, "10 minutes")
      .groupBy(window(col(spec.timeCol), spec.granularity)
        +: spec.dims.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select((col("window.start").as("bucket")
        +: spec.dims.map(col)) ++ Seq(col("n"), col("sum_value")): _*)
  }

  /** Submit + start (reference `POST /druid/indexer/v1/supervisor`).
    * A failed start leaves no registry entry — the id stays re-submittable
    * instead of being poisoned in Pending.
    */
  def submit(spark: SparkSession, spec: SupervisorSpec): Status = synchronized {
    require(!registry.contains(spec.id), s"supervisor ${spec.id} already exists")
    val e = Entry(spec, None, Pending, 0L)
    registry.put(spec.id, e)
    try startQuery(spark, e)
    catch { case t: Throwable => registry.remove(spec.id); throw t }
    status(spec.id)
  }

  private def startQuery(spark: SparkSession, e: Entry): Unit = {
    val q = ingestStream(spark, e.spec).writeStream
      .queryName(e.spec.id)
      .format("parquet")
      .outputMode("append")
      .option("path", e.spec.outPath)
      .option("checkpointLocation", e.spec.checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    e.query = Some(q)
    e.state = Running
  }

  /** Block until the current backlog is drained (AvailableNow semantics —
    * the bounded-test analog of the supervisor running continuously).
    */
  def awaitDrained(id: String): Unit =
    registry.get(id).flatMap(_.query).foreach { q =>
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }

  /** Suspend (reference `POST .../supervisor/{id}/suspend`): stop the query
    * but KEEP the checkpoint — source offsets stay committed, so the next
    * resume continues after the last durable batch.
    */
  def suspend(id: String): Status = synchronized {
    val e = registry.getOrElse(id, sys.error(s"no supervisor $id"))
    e.query.foreach { q =>
      observeFailure(e, q)
      e.batches = math.max(e.batches, completedBatches(q))
      q.stop(); q.awaitTermination()
    }
    e.query = None
    if (e.state != Unhealthy) e.state = Suspended
    status(id)
  }

  private def observeFailure(e: Entry,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.exception.foreach { ex =>
      e.state = Unhealthy
      e.error = Some(ex.getMessage)
    }

  /** Resume (reference `POST .../supervisor/{id}/resume`): restart from the
    * retained checkpoint — only data arriving after the suspend is read.
    */
  def resume(spark: SparkSession, id: String): Status = synchronized {
    val e = registry.getOrElse(id, sys.error(s"no supervisor $id"))
    require(e.state == Suspended, s"supervisor $id is not suspended")
    startQuery(spark, e)
    status(id)
  }

  /** Terminate (reference `POST .../supervisor/{id}/terminate`): stop and
    * forget. Published output and the checkpoint directory remain on disk,
    * like a terminated supervisor's published segments.
    */
  def terminate(id: String): Unit = synchronized {
    registry.remove(id).foreach { e =>
      e.state = Stopping
      e.query.foreach { q => q.stop(); q.awaitTermination() }
    }
  }

  /** Status (reference `GET .../supervisor/{id}/status`). A query that died
    * with an exception reports UNHEALTHY (reference UNHEALTHY_SUPERVISOR),
    * never a phantom RUNNING.
    */
  def status(id: String): Status =
    statusOf(id, registry.getOrElse(id, sys.error(s"no supervisor $id")))

  private def statusOf(id: String, e: Entry): Status = {
    e.query.foreach(observeFailure(e, _))
    val batches = math.max(e.batches,
      e.query.map(completedBatches).getOrElse(0L))
    Status(id, e.state, batches, healthy = e.state != Unhealthy, error = e.error)
  }

  /** List active supervisor ids (reference `GET /druid/indexer/v1/supervisor`). */
  def list(): Seq[String] = registry.keys.toSeq.sorted

  /** All registered supervisors with their lifecycle state — feeds the
    * sys.supervisors system table, which otherwise only sees ACTIVE
    * streaming queries and would drop suspended supervisors. Snapshot
    * iteration over the registry itself — a concurrent terminate() must
    * make the row disappear, not crash the system-table query.
    */
  def statuses(): Seq[Status] =
    registry.readOnlySnapshot().toSeq.sortBy(_._1)
      .map { case (id, e) => statusOf(id, e) }
}
