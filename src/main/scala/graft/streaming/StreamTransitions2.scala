package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** [[StreamTransitions]] ported to Spark 4's `transformWithState` —
  * the MIGRATION certificate for the engine's one
  * flatMapGroupsWithState job: identical per-user chaining logic
  * (one remembered last event, in-batch sort, cross-batch straggler
  * drop), with the old API's GroupStateTimeout replaced by an explicit
  * EVENT-TIME TIMER (registerTimer / handleExpiredTimer — the timer
  * half of the new API, which [[StreamingLru]]'s timerless door does
  * not reach). StreamingExtrasSpec pins the port's output
  * bit-identical to the old door's on the same split AND proves the
  * timer actually evicts: a user idle past the horizon loses their
  * remembered event, so a later arrival re-seeds WITHOUT emitting the
  * cross-gap pair, while a still-live user's arrival pairs.
  *
  * Timer discipline: exactly one live timer per user — each update
  * deletes the previous timer before registering the new horizon
  * (registerTimer ACCUMULATES otherwise and a stale early timer would
  * evict a still-live user); the old timer's expiry is carried in
  * state (listTimers would re-scan).
  *
  * Scale shape: state = one (ts, id, type) row + one timer per user
  * live inside the horizon — |active users|, never |events|; RocksDB
  * state store, versioned per batch (the exactly-once half).
  */
object StreamTransitions2 {

  import StreamTransitions.{Ev, Transition}

  /** LastEvent plus the registered timer's expiry (to delete it
    * before re-registering).
    */
  final case class Last2(tsUs: Long, eventId: Long, tpe: String,
                         timerMs: Long)

  private class TransitionProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, Ev, Transition] {
    @transient private var st: ValueState[Last2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Last2](
        "last", Encoders.product[Last2], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[Transition] = {
      val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
      val last = if (st.exists()) Some(st.get()) else None
      val fresh = sorted.filter(e => last.forall(l =>
        e.ts_us > l.tsUs || (e.ts_us == l.tsUs && e.event_id > l.eventId)))
      val chainTypes = last.map(l => (l.tsUs, l.tpe)).toSeq ++
        fresh.map(e => (e.ts_us, e.event_type))
      val out = chainTypes.sliding(2).collect {
        case Seq((fromUs, fromTpe), (toUs, toTpe)) =>
          Transition(user, fromTpe, toTpe, toUs - fromUs)
      }.toVector
      fresh.lastOption.foreach { e =>
        last.foreach(l => getHandle.deleteTimer(l.timerMs))
        val expiry = e.ts_us / 1000 + horizonMs
        getHandle.registerTimer(expiry)
        st.update(Last2(e.ts_us, e.event_id, e.event_type, expiry))
      }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Transition] = {
      // Watermark passed the user's last event + horizon: the final
      // event has no successor (batch lead() = null there) — drop the
      // state, emit nothing. Stale-timer guard: only the CURRENT
      // registered timer may evict (a delete can race an in-flight
      // expiry on restart).
      if (st.exists() && st.get().timerMs == expiredTimerInfo.getExpiryTimeInMs)
        st.clear()
      Iterator.empty
    }
  }

  /** Same surface as [[StreamTransitions.transitions]]. NOTE: the
    * caller must have [[RocksDbProvider]] set when it STARTS the
    * query (conf-scoping inside this builder would silently un-set
    * before the provider binds at start).
    */
  def transitions(events: DataFrame, watermark: String = "1 hour",
      horizonMs: Long = 3600000L): Dataset[Transition] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id", $"ts",
        unix_micros($"ts".cast("timestamp")).as("ts_us"),
        $"event_id", $"event_type")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
