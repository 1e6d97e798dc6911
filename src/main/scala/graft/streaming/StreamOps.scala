package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Batch and stream share the same DataFrame expressions — each of these
  * mirrors a batch operator (EventOps / Dedup) with the streaming-only
  * concerns added: watermarks bound state, windows bound emission, and
  * session state lives in the state store keyed by user.
  */
object StreamOps {

  /** File-source stream over an events directory: new parquet files are
    * discovered per micro-batch. Schema must be explicit — streaming
    * sources do not infer (and shouldn't: inference is a full read).
    * Pair with `writeStream.trigger(AvailableNow)` for catch-up batch
    * replays of a streaming pipeline. */
  def readEventsStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                       schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Event-time tumbling-window rollup (streaming twin of
    * EventOps.hourlyRollup). The watermark bounds window state: windows
    * older than max(event time) - delay are finalized and dropped, so
    * state is O(active windows × event types), not O(stream length). */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
                     watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Streaming exact dedup by event_id with bounded state: duplicates
    * arriving within the watermark horizon are dropped; state for ids
    * older than the horizon is evicted (streaming twin of E1). */
  def dedupStream(events: DataFrame,
                  watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- sessionization via flatMapGroupsWithState ----

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long,
                     sum_value: Double)

  /** Gap-based sessionization: events for a user belong to one session
    * until `gapMs` of event-time silence; the closed session is emitted
    * when the watermark passes end + gap (event-time timeout). State per
    * user is four scalars — constant, watermark-bounded.
    *
    * Scale: state store is hash-partitioned by user_id across executors;
    * each micro-batch shuffles only that batch's events. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    def update(userId: Long, rows: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(s.startMs),
          new Timestamp(s.endMs), s.n, s.sum))
      } else {
        val batch = rows.toSeq
        val lo = batch.map(_.ts.getTime).min
        val hi = batch.map(_.ts.getTime).max
        val add = batch.map(_.value).sum
        val next = state.getOption match {
          case Some(s) => SessionState(math.min(s.startMs, lo),
            math.max(s.endMs, hi), s.n + batch.size, s.sum + add)
          case None => SessionState(lo, hi, batch.size.toLong, add)
        }
        state.update(next)
        state.setTimeoutTimestamp(next.endMs + gapMs)
        Iterator.empty
      }
    }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
