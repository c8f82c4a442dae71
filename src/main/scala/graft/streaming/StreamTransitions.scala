package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermarked streaming form of the e14/e15 transition family
  * (`EventOps.transitionStats`): per-user consecutive event pairs
  * emitted from an event stream via `flatMapGroupsWithState` — the
  * bounded-state analog of the reference's complete-mode-forever
  * aggregation (SURVEY §2.5 ST3).
  *
  * State per user is ONE row: the latest (ts, event_id, event_type)
  * seen. Each micro-batch sorts its own slice of a user's events by
  * (ts, event_id) — the batch `lead()` window's exact order — chains it
  * onto the remembered last event, and emits one (from_type, to_type,
  * gap_us) row per consecutive pair. Equality contract (asserted in
  * StreamingExtrasSpec): when each user's events arrive in event-time
  * order ACROSS micro-batches (an ordered ingest log; within a batch
  * order is free, we sort), the union of emitted pairs over any batch
  * partitioning equals the batch `transitionStats` input bit for bit.
  * A cross-batch straggler older than the remembered last event is
  * DROPPED — the streaming trade the watermark bounds; it can only
  * under-count, never mis-pair.
  *
  * The event-time timeout evicts a user's state once the watermark
  * passes their last event plus the horizon: an idle user's final
  * event simply never becomes a `from` — exactly the batch semantics,
  * where `lead()` is null on the last row. State size is therefore
  * |active users in the horizon| rows, not |events|.
  */
object StreamTransitions {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      event_id: Long, event_type: String)
  final case class LastEvent(tsUs: Long, eventId: Long, tpe: String)
  final case class Transition(user_id: Long, from_type: String, to_type: String,
      gap_us: Long)

  /** `events` is any streaming frame bearing (user_id, ts, event_id,
    * event_type); emits one appended row per detected transition.
    */
  def transitions(events: DataFrame, watermark: String = "1 hour",
      horizonMs: Long = 3600000L): Dataset[Transition] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id", $"ts",
        // cast tolerates TIMESTAMP_NTZ sources (unix_micros is
        // TIMESTAMP-strict); no-op on an instant-typed ts.
        unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"event_id", $"event_type")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            // Watermark passed the user's last event + horizon: the
            // final event has no successor (batch lead() = null there).
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toArray.sortBy(e => (e.ts_us, e.event_id))
            val last = state.getOption
            // A straggler at or before the remembered last event arrived
            // across batches out of order — drop it (documented trade).
            val fresh = sorted.filter(e => last.forall(l =>
              e.ts_us > l.tsUs || (e.ts_us == l.tsUs && e.event_id > l.eventId)))
            val chainTypes = last.map(l => (l.tsUs, l.tpe)).toSeq ++
              fresh.map(e => (e.ts_us, e.event_type))
            val out = chainTypes.sliding(2).collect {
              case Seq((fromUs, fromTpe), (toUs, toTpe)) =>
                Transition(user, fromTpe, toTpe, toUs - fromUs)
            }.toVector
            fresh.lastOption.foreach { e =>
              state.update(LastEvent(e.ts_us, e.event_id, e.event_type))
              state.setTimeoutTimestamp(e.ts_us / 1000 + horizonMs)
            }
            out.iterator
          }
      }
  }
}
