package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q77 per-(user, day) EWMA.
  *
  * Unlike the funnel/retention machines (which finalize event-by-event as
  * the watermark passes them), the EWMA's unit of output is a whole DAY:
  * the group key is (user_id, day), events buffer while the day is open,
  * and the day FINALIZES exactly once — when the watermark reaches the
  * day's end, at which point no on-time event for it can still arrive
  * (an event-time timeout at day-end+1 guarantees the close fires even
  * with no further arrivals). Finalization sorts the buffer by
  * (ts, event_id) and folds y₁=x₁, yₙ = α·xₙ + (1-α)·yₙ₋₁ — the same
  * strict left fold as q77's batch aggregate, so batch and streaming
  * agree bitwise.
  *
  * State lifecycle: here `state.remove()` after emission IS correct — the
  * contrast with [[FunnelStream]]'s tombstone is deliberate. A funnel
  * completion is state-dependent (a later event cannot know the user
  * already converted without the tombstone), but a day's closure is
  * decidable from the KEY and the WATERMARK alone: any event for a closed
  * day must carry ts < dayEnd <= watermark, i.e. it is beyond-horizon
  * late, and the transition drops arrivals to stateless closed days
  * without needing state to witness the emission. So per-key state lives
  * only while the day is inside the watermark horizon — the state store
  * holds |users| × O(1 day), not the stream's history.
  *
  * In BATCH mode (no watermark → treated as +∞) every group finalizes in
  * its single invocation, reproducing q77 exactly (EwmaStreamSpec pins
  * batch equivalence and the multi-micro-batch streaming run).
  */
object EwmaStream {

  final case class VEv(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

  final case class EPending(us: Long, eventId: Long, value: Double) extends Timed

  final case class EwmaState(buf: Seq[EPending])

  /** One finalized day per (user, day), emitted exactly once. */
  final case class DayEwma(user_id: Long, day: Timestamp, n_events: Int, ewma: Double)

  private val DayUs = 86400000000L

  import StreamTime.{us, tsFromUs}

  /** UTC midnight of the event's day, in epoch micros. */
  def dayStartUs(eventUs: Long): Long = Math.floorDiv(eventUs, DayUs) * DayUs

  def transition(
      key: (Long, Long), events: Iterator[VEv],
      state: GroupState[EwmaState]): Iterator[DayEwma] = {
    // WatermarkBuffer's HORIZON form: nothing finalizes until the
    // watermark reaches the day's end, then the whole day does at once,
    // in WatermarkBuffer.ordered order — the whole-group-atomic twin of
    // the funnel/retention/bigram per-event drain
    val (userId, dayUs) = key
    val dayEndUs = dayUs + DayUs
    val wmUs = StreamTime.watermarkUs(state)
    val closed = WatermarkBuffer.horizonClosed(dayEndUs, wmUs)
    if (wmUs != Long.MaxValue && state.getOption.isEmpty && closed) {
      // the day is already closed (its record was emitted when the
      // watermark crossed dayEnd, or these are its first-ever arrivals,
      // beyond-horizon late either way): drop, leave no state — a second
      // (user, day) record must never be emitted
      Iterator.empty
    } else {
      val buf = state.getOption.map(_.buf).getOrElse(Nil) ++
        events.map(e => EPending(us(e.ts), e.event_id, e.value))
      if (closed) {
        // no on-time event for this day can still arrive: finalize once
        if (state.exists) state.remove()
        val xs = WatermarkBuffer.ordered(buf).map(_.value)
        if (xs.isEmpty) Iterator.empty
        else Iterator.single(DayEwma(userId, tsFromUs(dayUs), xs.length,
          xs.tail.foldLeft(xs.head)((acc, x) => 0.3d * x + 0.7d * acc)))
      } else {
        state.update(EwmaState(buf))
        // fire the close even if this user goes quiet
        WatermarkBuffer.armAtUs(state, dayEndUs)
        Iterator.empty
      }
    }
  }

  /** Finalized per-(user, day) EWMA records for a batch or streaming
    * events frame (schema of Tables.events). Streaming callers must set
    * a watermark. */
  def ewmaStages(events: DataFrame): Dataset[DayEwma] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[VEv]
      .groupByKey(e => (e.user_id, dayStartUs(us(e.ts))))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition)
  }

  /** Watermarked streaming entry point. */
  def ewmaStages(events: DataFrame, watermark: String): Dataset[DayEwma] =
    ewmaStages(events.withWatermark("ts", watermark))
}
