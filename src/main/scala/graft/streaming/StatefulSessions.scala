package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via flatMapGroupsWithState — the state
  * surface `session_window` can't express: sessions close on EITHER a
  * 5-minute inactivity gap OR a max-events cap (long-running bot sessions
  * split instead of growing without bound).
  *
  * Works identically over a batch Dataset (state starts empty, one call
  * per group) and a stream (incremental state + event-time timeout) —
  * tested both ways in StatefulSessionsSpec.
  *
  * Scale posture: state per user is ONE open session (4 numbers), not the
  * event history; with the watermark set, expired users are dropped by
  * the state store. Shuffle is a single hash partition by user_id.
  */
object StatefulSessions {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

  final case class Open(startUs: Long, lastUs: Long, n: Int, total: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      n_events: Int,
      total_value: Double,
      closed_by: String)

  val GapUs: Long = 5L * 60 * 1000000 // 5 minutes in micros

  private def us(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000

  /** Micros → Timestamp preserving sub-millisecond precision (a bare
    * `new Timestamp(ms)` would truncate and diverge from session_window). */
  private def tsFromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  private def close(userId: Long, s: Open, why: String): Session =
    Session(userId, tsFromUs(s.startUs), s.n, s.total, why)

  /** The state-transition function: fold this batch's (time-sorted)
    * events into the open session, emitting every session that closes. */
  def transition(maxEvents: Int)(
      userId: Long, events: Iterator[Ev], state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _, "timeout")).iterator
      state.remove()
      out
    } else {
      val sorted = events.toSeq.sortBy(e => (us(e.ts), e.event_id))
      val closed = Seq.newBuilder[Session]
      var open = state.getOption
      sorted.foreach { e =>
        val t = us(e.ts)
        open match {
          case Some(s) if t - s.lastUs < GapUs && s.n < maxEvents =>
            open = Some(Open(s.startUs, t, s.n + 1, s.total + e.value))
          case Some(s) =>
            closed += close(userId, s, if (s.n >= maxEvents) "cap" else "gap")
            open = Some(Open(t, t, 1, e.value))
          case None =>
            open = Some(Open(t, t, 1, e.value))
        }
      }
      open match {
        case Some(s) =>
          state.update(s)
          // close once the watermark passes the session's gap horizon;
          // getCurrentWatermarkMs THROWS in batch mode (no watermark), so
          // probe it defensively — batch simply leaves the tail open
          scala.util.Try(state.getCurrentWatermarkMs()).foreach { _ =>
            state.setTimeoutTimestamp(s.lastUs / 1000 + GapUs / 1000)
          }
        case None => state.remove()
      }
      closed.result().iterator
    }
  }

  /** Apply over a batch or streaming events DataFrame (schema of
    * Tables.events). Streaming callers must set a watermark first. */
  def sessions(events: DataFrame, maxEvents: Int = Int.MaxValue): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition(maxEvents))
  }
}
