package graft.monitor

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** One observed execution event (SURVEY.md §2 "monitoring" — the
  * Spark-native analogue of the reference's CloudWatch log/metric feed,
  * sudo_code.txt:257-276).
  *
  * `rows` is the sink-side output row count when the plan exposes one
  * (numOutputRows on the write node), else -1. Timestamps are wall-clock
  * millis: monitor events feed ALARM EVALUATION (threshold counts), never
  * correctness oracles, so nondeterminism is fine here.
  */
final case class MetricEvent(
    ts_ms: Long,
    source: String, // "sql" | "stream"
    event: String, // "success" | "failure" | "progress" | "started" | "terminated"
    name: String, // action name (count/save/…) or streaming query name
    rows: Long,
    duration_ms: Long,
    error: String)

/** Session-attachable execution monitor.
  *
  * The reference alarms on Glue job failure and DLQ S3-object activity
  * through CloudWatch (sudo_code.txt:257-276, diagram_1.txt:110-115). The
  * Spark-native feed is the listener bus: a [[QueryExecutionListener]]
  * sees every DataFrame action's success/failure + duration, and a
  * [[StreamingQueryListener]] sees every micro-batch's progress and every
  * stream termination (with exception, if any). Events land in a BOUNDED
  * ring buffer (default 10k, oldest dropped) so a long-lived session —
  * the reference's loop runs every 15 min for years — holds a fixed few
  * MBs, not an unbounded history; the durable history is the ledger and
  * the DLQ themselves, which [[Alarms]] scans directly.
  *
  * Thread-safety: listeners fire on the listener-bus thread; the queue is
  * concurrent and [[snapshot]] copies it. Attach/detach are idempotent
  * per instance.
  */
final class GraftMonitor(maxEvents: Int = 10000) extends Serializable {

  private val buf = new ConcurrentLinkedQueue[MetricEvent]()
  private val dropped = new AtomicLong(0L)
  // ConcurrentLinkedQueue.size is O(n); the bound check runs on the
  // listener-bus thread for every event, so track the count separately
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)

  def record(e: MetricEvent): Unit = {
    buf.add(e)
    size.incrementAndGet()
    while (size.get > maxEvents) { // bounded: drop oldest
      if (buf.poll() != null) {
        size.decrementAndGet()
        dropped.incrementAndGet(): Unit
      }
    }
  }

  def droppedCount: Long = dropped.get()

  // ---- predicate capture (round 20 — the layout advisor's feed) -------

  // same bounded-ring discipline as the metric buffer: the durable
  // history is the predstats STORE ([[PredicateStats.publish]]); this
  // ring only holds what hasn't been published yet
  private val predBuf = new ConcurrentLinkedQueue[PredicateEvent]()
  private val predSize = new java.util.concurrent.atomic.AtomicInteger(0)

  def recordPredicates(es: Seq[PredicateEvent]): Unit = {
    es.foreach { e =>
      predBuf.add(e)
      predSize.incrementAndGet()
    }
    while (predSize.get > maxEvents) {
      if (predBuf.poll() != null) predSize.decrementAndGet(): Unit
    }
  }

  def predicateEvents: Seq[PredicateEvent] = {
    import scala.jdk.CollectionConverters._
    predBuf.iterator().asScala.toVector
  }

  /** Publish the ring's predicates for `lakeRoot` to the lake's
    * durable predstats store and clear what was published — ONLY the
    * events the lake qualification actually persisted (r20 ADVICE: a
    * monitor observing two lakes must not drop the second lake's
    * unpublished evidence when the first publishes). Retrying a FAILED
    * publish with the same token converges; after a SUCCESS the ring
    * is drained, so the next publish needs a fresh token or it would
    * overwrite the earlier batch ([[PredicateStats.publish]]). */
  def publishPredicates(spark: SparkSession, lakeRoot: String,
                        token: String): Boolean = {
    val snap = PredicateStats.forLake(spark, lakeRoot, predicateEvents)
    val ok = PredicateStats.publish(spark, lakeRoot, snap, token)
    if (ok) snap.foreach { e =>
      if (predBuf.remove(e)) predSize.decrementAndGet(): Unit
    }
    ok
  }

  /** All buffered events as a DataFrame (copy; safe to use while
    * listeners keep firing). */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq.toDF()
  }

  def events: Seq[MetricEvent] = {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toVector
  }

  // ---- listeners ------------------------------------------------------

  /** Output rows of the terminal (write) node when exposed. */
  private def outputRows(qe: QueryExecution): Long =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

  object sqlListener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      record(MetricEvent(System.currentTimeMillis(), "sql", "success", funcName,
        outputRows(qe), durationNs / 1000000L, null))
      // layout-advisor feed: classify the executed plan's lake-scan
      // predicates. Defensive catch — a capture bug must never take
      // down the listener bus (plan shapes are open-ended).
      try recordPredicates(PredicateStats.extract(qe))
      catch { case _: Throwable => () }
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      record(MetricEvent(System.currentTimeMillis(), "sql", "failure", funcName,
        -1L, -1L, Option(exception.getMessage).getOrElse(exception.getClass.getName)))
  }

  object streamListener extends StreamingQueryListener {
    import StreamingQueryListener._
    override def onQueryStarted(event: QueryStartedEvent): Unit =
      record(MetricEvent(System.currentTimeMillis(), "stream", "started",
        Option(event.name).getOrElse(event.id.toString), -1L, -1L, null))
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      record(MetricEvent(System.currentTimeMillis(), "stream", "progress",
        Option(p.name).getOrElse(p.id.toString), p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L), null))
    }
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
      record(MetricEvent(System.currentTimeMillis(), "stream", "terminated",
        event.id.toString, -1L, -1L, event.exception.orNull))
  }

  // listener registration is additive in Spark, so track the session
  // this instance is attached to: a second attach (same session) is a
  // no-op, attach to a different session while attached is rejected,
  // and detach only acts on the session actually holding the listeners
  private val attachedTo =
    new java.util.concurrent.atomic.AtomicReference[SparkSession](null)

  def attach(spark: SparkSession): Unit =
    if (attachedTo.compareAndSet(null, spark)) {
      spark.listenerManager.register(sqlListener)
      spark.streams.addListener(streamListener)
    } else if (attachedTo.get() ne spark) {
      throw new IllegalStateException(
        "this GraftMonitor is already attached to a different session; " +
          "detach it there first or use one monitor per session")
    }

  def detach(spark: SparkSession): Unit =
    if (attachedTo.compareAndSet(spark, null)) {
      spark.listenerManager.unregister(sqlListener)
      spark.streams.removeListener(streamListener)
    }
}
