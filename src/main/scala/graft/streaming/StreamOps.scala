package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over a graft-store stream (`spark.readStream
  * .format("graft-store")`): the Structured-Streaming layer of the engine —
  * event-time windows bounded by watermarks, and gap-based sessionization
  * as explicit keyed state. Both run equally on a batch DataFrame (Spark's
  * unified semantics), which is how the specs pin their results.
  *
  * Scale notes: `windowedCounts` is a streaming aggregation whose state is
  * one row per (window, part) — bounded by the watermark horizon, not the
  * stream length; the shuffle is on the same (window, part) key at any
  * cluster size. `sessionize` keys state by (part, field value); the
  * watermark evicts closed sessions, so state is proportional to ACTIVE
  * keys. Skewed keys (one chatty user) are a single state row, not a
  * partition hot-spot.
  */
object StreamOps {

  /** ts int64-ns → event-time timestamp (µs precision, what Spark's
    * window/watermark machinery operates on). */
  def eventTime(tsNs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((tsNs / 1000L).cast("long"))

  /** Tumbling event-time window counts per partition with a watermark:
    * in append mode a (window_start, part, records) row is emitted exactly
    * once, when the watermark passes the window end — the standard
    * live-rates query a log store feeds a dashboard from.
    */
  def windowedCounts(events: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDur).as("w"), col("part"))
      .agg(count(lit(1)).as("records"))
      .select(col("w.start").as("window_start"), col("part"), col("records"))

  /** One closed session: a maximal run of events for (part, key) with no
    * gap larger than the configured idle timeout. */
  final case class Session(part: String, key: String, startTs: Long,
      endTs: Long, events: Long)

  private final case class SessionState(startTs: Long, endTs: Long, events: Long)

  /** Gap-based sessionization keyed by (part, fields[keyField]) via
    * flatMapGroupsWithState with an event-time timeout: a session closes
    * (and is emitted, exactly once) when the watermark passes its last
    * event plus the gap. The reference has no session concept; this is the
    * "custom keyed state" seam a training-data/observability pipeline
    * needs (user activity spans, crawl visits, transcript turns).
    *
    * Events with ts at or below the watermark (late beyond the delay) are
    * dropped by the watermark, so state never resurrects a closed session.
    */
  def sessionize(events: DataFrame, keyField: String, gapSeconds: Long,
      watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapNs = gapSeconds * 1000000000L
    events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .select(col("part"), coalesce(element_at(col("fields"), keyField), lit(""))
        .as("key"), col("ts"), col("event_time"))
      .as[(String, String, Long, java.sql.Timestamp)]
      .groupByKey { case (part, key, _, _) => (part, key) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case ((part, key), rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: the session is closed
            val s = state.get
            state.remove()
            Iterator.single(Session(part, key, s.startTs, s.endTs, s.events))
          } else {
            // fold the batch's events into (possibly several) sessions;
            // emit every session closed WITHIN the batch, keep the last open
            val sorted = rows.map(r => r._3).toArray.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { ts =>
              cur match {
                case Some(s) if ts - s.endTs <= gapNs =>
                  cur = Some(SessionState(s.startTs, math.max(s.endTs, ts), s.events + 1))
                case Some(s) =>
                  closed ::= Session(part, key, s.startTs, s.endTs, s.events)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the WATERMARK (not wall clock) passes end + gap
              state.setTimeoutTimestamp(s.endTs / 1000000L + gapSeconds * 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
