package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q72 ordered funnel (first view → later click →
  * later purchase), via flatMapGroupsWithState keyed by user.
  *
  * Exactness argument: the transition FINALIZES buffered events only once
  * the watermark has passed them, in ascending (ts, event_id) order. An
  * event that would finalize out of order must have event time below the
  * watermark at arrival, which is precisely the late data the watermark
  * policy already drops — so per user, finalization is globally
  * time-ordered, and the 3-stage machine needs only the three stage
  * timestamps as long-lived state:
  *   view     → t1 = first finalized view
  *   click    → t2 = first finalized click with ts > t1
  *   purchase → t3 = first finalized purchase with ts > t2
  * which is exactly q72's min/join cascade (strict > at each stage).
  *
  * Scale posture: per-user state is 3 optional timestamps plus ONLY the
  * events inside the watermark horizon (the buffer drains every time the
  * watermark advances; an event-time timeout re-invokes idle groups so
  * draining does not depend on new arrivals). A 1000-executor job holds
  * |users| × (3 longs + horizon backlog), never the stream's history.
  * Completed users keep a 3-long tombstone forever rather than having
  * state removed — removal would let post-purchase events re-enter the
  * funnel at stage 1 and double-count (callers who need reclamation can
  * layer a TTL on top, accepting that documented caveat).
  * Output is append-mode monotone (a stage record is emitted exactly once,
  * when it becomes final), so downstream streaming aggregations — e.g. the
  * per-stage counts — remain legal.
  *
  * In BATCH mode the same code path sees no watermark (getCurrentWatermarkMs
  * throws → treated as +∞), finalizes everything in one invocation per
  * group, and reproduces the batch funnel exactly — FunnelStreamSpec pins
  * both that equivalence and the streaming run against q72's per-user CTEs.
  */
object FunnelStream {

  final case class FEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

  /** (micros, event_id, event_type) triple buffered until finalizable. */
  final case class Pending(us: Long, eventId: Long, tpe: String) extends Timed

  final case class FunnelState(
      t1: Option[Long], t2: Option[Long], t3: Option[Long],
      buf: Seq[Pending])

  /** One funnel stage (1 = view, 2 = click, 3 = purchase) becoming final
    * for a user, emitted exactly once. */
  final case class FunnelStage(user_id: Long, stage: Int, ts: Timestamp)

  import StreamTime.{us, tsFromUs}

  /** a + b clamped at Long.MaxValue — a huge TTL means "never expire",
    * not overflow-and-expire-immediately. */
  private def satAdd(a: Long, b: Long): Long =
    if (b > Long.MaxValue - a) Long.MaxValue else a + b

  /** Fold time-ordered, finalized events into the stage machine. With a
    * TTL, a completed funnel whose expiry (purchase + ttl) lies before
    * the event being processed has expired IN EVENT TIME: the user is
    * reborn and the event is eligible for a fresh stage 1. The rule
    * references only event timestamps — never the watermark or arrival
    * batch — so batch and streaming runs (and any micro-batch packing of
    * the same stream) produce identical output. */
  private def advance(
      userId: Long, st: FunnelState, ready: Seq[Pending],
      ttlUs: Option[Long]): (FunnelState, Seq[FunnelStage]) = {
    var (t1, t2, t3) = (st.t1, st.t2, st.t3)
    val out = Seq.newBuilder[FunnelStage]
    ready.foreach { e =>
      if (t3.nonEmpty && ttlUs.exists(ttl => e.us > satAdd(t3.get, ttl))) {
        t1 = None; t2 = None; t3 = None // reborn: this event starts a new lifetime
      }
      e.tpe match {
        case "view" if t1.isEmpty =>
          t1 = Some(e.us); out += FunnelStage(userId, 1, tsFromUs(e.us))
        case "click" if t1.nonEmpty && t2.isEmpty && e.us > t1.get =>
          t2 = Some(e.us); out += FunnelStage(userId, 2, tsFromUs(e.us))
        case "purchase" if t2.nonEmpty && t3.isEmpty && e.us > t2.get =>
          t3 = Some(e.us); out += FunnelStage(userId, 3, tsFromUs(e.us))
        case _ => ()
      }
    }
    (FunnelState(t1, t2, t3, st.buf), out.result())
  }

  /** The state-transition function (shared by batch and streaming runs).
    * `tombstoneTtlUs`, when set, bounds COMPLETED-user state: a user's
    * 3-long tombstone becomes reclaimable once the watermark passes
    * `purchase + ttl`. The documented caveat: an event whose EVENT TIME
    * lies beyond that horizon re-enters the funnel at stage 1
    * (over-counting that user once per expiry). The re-entry rule is
    * applied per event inside [[advance]] — by event time only, never by
    * arrival batch or watermark — so the output is deterministic under
    * replay, micro-batch repacking, and batch/streaming mode alike; only
    * state RECLAMATION follows the watermark. Unbounded tombstones
    * (ttl = None, the default) are the only choice with no re-entry;
    * the TTL trades that single-funnel exactness for state proportional
    * to recently-converted users instead of lifetime-converted users. */
  def transition(
      userId: Long, events: Iterator[FEv],
      state: GroupState[FunnelState]): Iterator[FunnelStage] =
    transition(None)(userId, events, state)

  /** TTL-parameterized form; `transition(None)` is the exact/unbounded one. */
  def transition(tombstoneTtlUs: Option[Long])(
      userId: Long, events: Iterator[FEv],
      state: GroupState[FunnelState]): Iterator[FunnelStage] = {
    // admission/drain/ordering/timeout semantics live in WatermarkBuffer
    // (shared with retention/bigram/ewma); this machine is the fold
    val wmUs = StreamTime.watermarkUs(state)
    val st0 = state.getOption.getOrElse(FunnelState(None, None, None, Nil))
    val fresh = WatermarkBuffer.admit(
      events.map(e => Pending(us(e.ts), e.event_id, e.event_type)), wmUs)
    val (ready, still) = WatermarkBuffer.drain(st0.buf, fresh, wmUs)
    val (st1, out) = advance(userId, st0.copy(buf = still), ready, tombstoneTtlUs)
    if (st1.t3.nonEmpty) {
      // Funnel complete: keep a 3-timestamp TOMBSTONE, never remove(). A
      // user who keeps generating events after the purchase (views, more
      // clicks) would otherwise see fresh empty state and re-emit stage 1
      // — overcounting funnelCounts and breaking the exactly-once /
      // batch-equivalence guarantee. The tombstone is 3 longs per
      // completed user (buffer dropped — no stage can ever fire again,
      // so pending events are dead weight), still bounded state.
      // With a TTL configured, the EMISSION rule is event-time-only (see
      // advance: an event past purchase + ttl is reborn at stage 1), so
      // output is identical however the stream is packed into batches —
      // the watermark below only decides when STATE becomes reclaimable.
      // Buffered events beyond the expiry belong to the next lifetime
      // and must survive; events inside the tombstone's horizon are dead
      // weight exactly as in the unbounded case.
      tombstoneTtlUs match {
        case Some(ttl) if wmUs != Long.MaxValue =>
          val expiryUs = satAdd(st1.t3.get, ttl)
          val keepBuf = still.filter(_.us > expiryUs) // next-lifetime events
          if (wmUs > expiryUs) {
            // tombstone horizon fully below the watermark: reclaim
            if (keepBuf.isEmpty) state.remove()
            else {
              state.update(FunnelState(None, None, None, keepBuf))
              WatermarkBuffer.armAtEarliest(state, keepBuf, wmUs)
            }
          } else {
            state.update(st1.copy(buf = keepBuf))
            // re-invoke at the expiry horizon so reclamation does not
            // depend on the user ever producing another event
            if (expiryUs != Long.MaxValue)
              WatermarkBuffer.armAtUs(state, expiryUs)
          }
        case _ =>
          state.update(st1.copy(buf = Nil))
      }
    } else {
      state.update(st1)
      // re-invoke once the watermark passes the earliest pending event,
      // even if no further events arrive for this user
      WatermarkBuffer.armAtEarliest(state, still, wmUs)
    }
    out.iterator
  }

  /** Finalized funnel-stage records for a batch or streaming events frame
    * (schema of Tables.events). Streaming callers must set a watermark. */
  def funnelStages(events: DataFrame): Dataset[FunnelStage] =
    funnelStages(events, tombstoneTtlUs = None)

  /** As [[funnelStages]], with optional completed-user tombstone TTL
    * (micros of event time past the purchase; see [[transition]] for the
    * exactness caveat the TTL buys state reclamation with). */
  def funnelStages(events: DataFrame, tombstoneTtlUs: Option[Long]): Dataset[FunnelStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition(tombstoneTtlUs))
  }

  /** Watermarked streaming entry point. */
  def funnelStages(events: DataFrame, watermark: String): Dataset[FunnelStage] =
    funnelStages(events.withWatermark("ts", watermark))

  /** Watermarked streaming entry point with tombstone TTL. */
  def funnelStages(events: DataFrame, watermark: String,
      tombstoneTtlUs: Long): Dataset[FunnelStage] =
    funnelStages(events.withWatermark("ts", watermark), Some(tombstoneTtlUs))

  /** q72's headline shape from the stage records: one count per stage. */
  def funnelCounts(stages: Dataset[FunnelStage]): DataFrame =
    stages.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
}
