package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterparts of the pipeline operators — the Structured
  * Streaming shapes a continuously-ingesting training-data pipeline needs:
  * watermarked event-time windows for rolling aggregates, and
  * flatMapGroupsWithState with event-time timeouts for session state. Both
  * are pure plan builders over a streaming DataFrame (`spark.readStream`
  * or MemoryStream in specs); sinks/triggers belong to the caller.
  */
object StreamingOps {

  /** Watermarked hourly event counts — the streaming `events_hourly`:
    * late events beyond the watermark are dropped, windows finalize once
    * the watermark passes (append mode works downstream). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the ingest-time counterpart of `dedup_exact`:
    * drop re-ingested duplicate documents by content fingerprint.
    * `dropDuplicatesWithinWatermark` bounds the state store: a fingerprint
    * is retained only until the watermark passes its event time — the
    * correct trade for an unbounded ingest (exact dedup over ALL history
    * is the batch op's job; streaming dedup guards the ingest window with
    * bounded state). */
  def dedupByFingerprint(docs: DataFrame, watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  final case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)
  final case class SessionOut(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** session gap, matching the batch `sessionize` op (Ops.scala): a new
    * session starts after >1800 s of inactivity. */
  val SessionGapMs: Long = 1800L * 1000

  /** Streaming sessionization via flatMapGroupsWithState: per-user state
    * carries the open session; an event past the gap (or an event-time
    * timeout once the watermark passes lastTs+gap) closes and EMITS the
    * finished session. Exactly the batch op's session boundaries, computed
    * incrementally with bounded state. */
  def sessionize(events: Dataset[SessionEvent],
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def close(s: SessionState): Unit =
            out += SessionOut(userId,
              new java.sql.Timestamp(s.sessionStart), new java.sql.Timestamp(s.lastTs), s.nEvents)
          if (state.hasTimedOut) {
            state.getOption.foreach(close)
            state.remove()
          } else {
            // micro-batch events arrive unordered: sort by (ts, event_id)
            // like the batch op's window ordering
            val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs > SessionGapMs =>
                  close(s)
                  cur = Some(SessionState(t, t, 1L))
                case Some(s) =>
                  cur = Some(SessionState(s.sessionStart, math.max(s.lastTs, t), s.nEvents + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + SessionGapMs)
            }
          }
          out.iterator
      }
  }
}
