package graft.streaming

import java.sql.Timestamp
import java.time.{DayOfWeek, Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q73 weekly retention cohorts, by the same
  * watermark-ordered finalization argument as [[FunnelStream]]: events
  * buffer until the watermark passes them, then finalize in ascending
  * (ts, event_id) order — so per user the first finalized event fixes the
  * cohort week (it IS min(ts), no earlier event can still arrive), and
  * each later event's week emits one (cohort_week, week_n) record the
  * first time that week is seen.
  *
  * Week truncation matches `date_trunc('week', ts)` in UTC (Monday
  * 00:00) — computed on epoch micros in the JVM, pinned against the SQL
  * function in RetentionStreamSpec.
  *
  * Scale posture: per-user state is the cohort week plus the LAST
  * emitted week — O(1), because finalization is time-ordered per user
  * (the module's core argument), so observed weeks are non-decreasing
  * and one week of memory dedupes them (the transition fails loud if
  * that invariant is ever violated rather than silently dropping a
  * record); plus the watermark-horizon buffer. No TTL knob is offered
  * (contrast [[FunnelStream]]): retention semantics NEED the cohort for
  * the user's whole lifetime — a resurrected user must count in their
  * original cohort, so reclaiming completed-user state would silently
  * corrupt cohort assignment, and the state is O(1) anyway. Output is
  * append-mode exactly-once per (user, week), so the q73 aggregation
  * (count per cohort_week × week_n) is a legal downstream streaming
  * aggregate.
  */
object RetentionStream {

  final case class REv(event_id: Long, ts: Timestamp, user_id: Long)

  final case class RPending(us: Long, eventId: Long) extends Timed

  /** NOTE: this schema replaced an emitted-weeks Seq (round 6). Spark's
    * state-store schema check will refuse to restart a streaming query
    * checkpointed under the old layout — redeploying across the change
    * means a fresh checkpoint (cohorts rebuild from the replayed
    * stream, or from a batch backfill — the same code runs both). */
  final case class RetentionState(
      cohortUs: Option[Long], lastWeekUs: Option[Long], buf: Seq[RPending])

  /** One first-activity-in-week record per (user, week). */
  final case class WeekActive(user_id: Long, cohort_week: Timestamp, week_n: Int)

  import StreamTime.{us, tsFromUs}

  /** Monday-00:00 UTC week start of an epoch-micros instant, in micros —
    * the JVM twin of `date_trunc('week', ts)` under a UTC session. */
  def weekStartUs(eventUs: Long): Long = {
    val day = Instant.ofEpochSecond(Math.floorDiv(eventUs, 1000000L))
      .atZone(ZoneOffset.UTC).toLocalDate
    val monday = day.minusDays(day.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue)
    monday.atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000L
  }

  def transition(
      userId: Long, events: Iterator[REv],
      state: GroupState[RetentionState]): Iterator[WeekActive] = {
    // admission/drain/ordering/timeout semantics live in WatermarkBuffer
    // (shared with funnel/bigram/ewma); this machine is the fold
    val wmUs = StreamTime.watermarkUs(state)
    val st0 = state.getOption.getOrElse(RetentionState(None, None, Nil))
    val fresh = WatermarkBuffer.admit(
      events.map(e => RPending(us(e.ts), e.event_id)), wmUs)
    val (ready, still) = WatermarkBuffer.drain(st0.buf, fresh, wmUs)
    var cohort = st0.cohortUs
    var lastWk = st0.lastWeekUs
    val out = Seq.newBuilder[WeekActive]
    ready.foreach { e =>
      if (cohort.isEmpty) cohort = Some(weekStartUs(e.us))
      val wk = weekStartUs(e.us)
      // finalization is time-ordered per user, so weeks are non-
      // decreasing and the LAST emitted week dedupes (O(1) state). A
      // smaller week here would mean that argument — and therefore the
      // cohort assignment itself — is broken: fail loud, never drop.
      // The violating event is in checkpointed state, so a restart
      // rethrows identically (poisoned checkpoint) — the exception
      // message carries the recovery path for the on-call operator.
      if (lastWk.exists(wk < _))
        throw new IllegalStateException(
          s"retention finalization order violated for user $userId: " +
            s"week $wk after ${lastWk.get}. This invariant failure is " +
            "checkpointed — restarting rethrows. Recovery: start from a " +
            "FRESH checkpoint and rebuild cohorts by replaying the " +
            "stream from the source's retained history, or run the " +
            "batch twin (the same retentionStages code) over the " +
            "archived events as a backfill; see the RetentionState " +
            "schema-migration note for the identical procedure.")
      if (!lastWk.contains(wk)) {
        lastWk = Some(wk)
        out += WeekActive(userId, tsFromUs(cohort.get),
          ((wk - cohort.get) / 1000000L / 604800L).toInt)
      }
    }
    state.update(RetentionState(cohort, lastWk, still))
    WatermarkBuffer.armAtEarliest(state, still, wmUs)
    out.result().iterator
  }

  /** Finalized (user, week) activity records for a batch or streaming
    * events frame. Streaming callers must set a watermark. */
  def retentionStages(events: DataFrame): Dataset[WeekActive] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"))
      .as[REv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition)
  }

  /** Watermarked streaming entry point. */
  def retentionStages(events: DataFrame, watermark: String): Dataset[WeekActive] =
    retentionStages(events.withWatermark("ts", watermark))

  /** q73's headline shape from the stage records. */
  def cohortCounts(stages: Dataset[WeekActive]): DataFrame =
    stages.groupBy(col("cohort_week"), col("week_n"))
      .agg(count(lit(1)).as("n_users"))
}
