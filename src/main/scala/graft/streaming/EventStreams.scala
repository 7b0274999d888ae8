package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming versions of the event operators.
  *
  * The reference engine has no streaming layer (SURVEY.md §2.9) — batch
  * iteration with checkpoints covers its semantics. These operators are the
  * forward-looking additions a training-data pipeline needs: incremental
  * windowed aggregation and custom sessionization state, expressed as
  * `readStream → transform → writeStream` so the SAME logical aggregation
  * as the batch [[EventOps]] runs incrementally with watermark-bounded
  * state. */
object EventStreams {

  /** Tumbling 1-hour windowed counts with a 2-hour watermark: the
    * incremental form of [[EventOps.hourlyWindow]]. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total"))

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(lastTsMicros: Long, sessions: Long, events: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Gap-based sessionization with explicit state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): emits the running
    * (user, session-count, event-count) after every batch — the streaming
    * form of [[EventOps.sessionCounts]]. */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          // within-batch ordering pinned by (ts, then arrival)
          batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val micros = e.ts.getTime * 1000L
            val newSession = s.lastTsMicros == Long.MinValue ||
              micros - s.lastTsMicros > gapSec * 1000000L
            s = SessionState(micros, s.sessions + (if (newSession) 1 else 0), s.events + 1)
          }
          state.update(s)
          Iterator(SessionUpdate(user, s.sessions, s.events))
      }
  }
}
