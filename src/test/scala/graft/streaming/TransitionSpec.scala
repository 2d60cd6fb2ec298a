package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec

/** Direct unit tests of the watermark-ordered transition functions via
  * Spark's TestGroupState — the paths the end-to-end streaming specs
  * cannot isolate: late-event drop, above-watermark buffering, timeout
  * re-invocation draining, and cross-invocation ordering. */
class TransitionSpec extends SparkSpec {

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000)
  private def usOf(s: Long): Long = s * 1000000L

  import org.apache.spark.api.java.Optional

  /** wmMs = None builds a BATCH-mode state (no watermark set). */
  private def state(wmMs: Option[Long], st: Option[FunnelStream.FunnelState]) =
    TestGroupState.create[FunnelStream.FunnelState](
      optionalState = st.map(Optional.of[FunnelStream.FunnelState])
        .getOrElse(Optional.empty[FunnelStream.FunnelState]()),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = wmMs.map(Optional.of[Long](_))
        .getOrElse(Optional.empty[Long]()),
      hasTimedOut = false)

  private def state(wmMs: Long, st: Option[FunnelStream.FunnelState] = None)
      : TestGroupState[FunnelStream.FunnelState] =
    state(Some(wmMs), st)

  private def ev(id: Long, sec: Long, tpe: String) =
    FunnelStream.FEv(id, ts(sec), 1L, tpe)

  test("events above the watermark buffer; nothing emits until finalizable") {
    val gs = state(wmMs = 0L)
    val out = FunnelStream.transition(1L,
      Iterator(ev(1, 100, "view"), ev(2, 200, "click")), gs).toList
    assert(out.isEmpty, "nothing below the watermark may finalize")
    assert(gs.get.buf.size == 2)
    assert(gs.getTimeoutTimestampMs.isPresent,
      "a pending buffer must register an event-time timeout")
  }

  test("late events (below the watermark) are dropped, not finalized out of order") {
    // watermark already at t=150: a view at t=100 is late and must be
    // dropped, so the click at t=200 (already buffered) finalizes against
    // NO earlier view — exactly the documented drop policy
    val st0 = FunnelStream.FunnelState(None, None, None,
      Seq(FunnelStream.Pending(usOf(200), 2L, "click")))
    val gs = state(wmMs = 300000L, st = Some(st0))
    val out = FunnelStream.transition(1L, Iterator(ev(1, 100, "view")), gs).toList
    assert(out.isEmpty, s"late view must not create a stage: $out")
    assert(gs.get.t1.isEmpty, "late view must not set the cohort stage")
  }

  test("timeout invocation drains the buffer in (ts, event_id) order") {
    // buffered out of arrival order; on re-invocation with the watermark
    // advanced, the machine must process view(100) before click(150)
    val st0 = FunnelStream.FunnelState(None, None, None, Seq(
      FunnelStream.Pending(usOf(150), 9L, "click"),
      FunnelStream.Pending(usOf(100), 7L, "view")))
    val gs = state(wmMs = 1000000L, st = Some(st0))
    val out = FunnelStream.transition(1L, Iterator.empty, gs).toList
    assert(out.map(s => (s.stage, s.ts.getTime / 1000)) == List((1, 100L), (2, 150L)),
      out.toString)
  }

  test("completed funnel keeps a tombstone, not fresh state") {
    val st0 = FunnelStream.FunnelState(None, None, None, Seq(
      FunnelStream.Pending(usOf(10), 1L, "view"),
      FunnelStream.Pending(usOf(20), 2L, "click"),
      FunnelStream.Pending(usOf(30), 3L, "purchase")))
    val gs = state(wmMs = 1000000L, st = Some(st0))
    val out = FunnelStream.transition(1L, Iterator.empty, gs).toList
    assert(out.map(_.stage) == List(1, 2, 3))
    // state.remove() here was the round-4 high-severity bug: a user whose
    // events continue after the purchase would see fresh empty state and
    // re-emit stage 1 — the completed user must keep a 3-long tombstone
    assert(gs.exists, "a completed funnel must keep a tombstone")
    val st1 = gs.get
    assert(st1.t1.nonEmpty && st1.t2.nonEmpty && st1.t3.nonEmpty)
    assert(st1.buf.isEmpty, "tombstone must not retain buffered events")
  }

  test("post-completion events never re-emit a stage (exactly-once)") {
    // user completed the funnel in an earlier micro-batch; they keep
    // browsing afterwards. Path 1: new events ABOVE the watermark arrive
    // at a tombstoned user — they are dead weight, so no buffering, no
    // timeout, no output
    val done = FunnelStream.FunnelState(
      Some(usOf(10)), Some(usOf(20)), Some(usOf(30)), Nil)
    val gs = state(wmMs = 35000L, st = Some(done))
    val out = FunnelStream.transition(1L,
      Iterator(ev(4, 40, "view"), ev(5, 50, "click"), ev(6, 60, "purchase")),
      gs).toList
    assert(out.isEmpty, s"post-completion events re-emitted stages: $out")
    assert(gs.exists && gs.get == done, "tombstone must survive unchanged")
    assert(!gs.getTimeoutTimestampMs.isPresent,
      "a completed user must not schedule timeouts for dead-weight events")
    // Path 2: events that buffered before completion landed now FINALIZE
    // against the completed machine — still no output, tombstone stays
    val withBuf = done.copy(buf = Seq(
      FunnelStream.Pending(usOf(40), 4L, "view"),
      FunnelStream.Pending(usOf(50), 5L, "purchase")))
    val gs2 = state(wmMs = 1000000L, st = Some(withBuf))
    val out2 = FunnelStream.transition(1L, Iterator.empty, gs2).toList
    assert(out2.isEmpty, s"finalized post-completion events emitted: $out2")
    assert(gs2.exists && gs2.get == done, "tombstone must shed the dead buffer")
  }

  test("funnel TTL output is invariant under micro-batch packing") {
    // The TTL re-entry rule lives INSIDE the event fold (event ts vs
    // purchase + ttl), so however the same stream is split into
    // invocations — with whatever watermark schedule — the emitted stage
    // records must be identical, and identical to a single-shot batch
    // run. This pins the review-found failure mode where a post-expiry
    // event arriving in the same invocation as tombstone reclamation was
    // silently dropped (output depended on batch boundaries).
    val ttlUs = 1000L * 1000000L // expiry = purchase + 1000 s
    val events = List(ev(1, 100, "view"), ev(2, 200, "click"),
      ev(3, 300, "purchase"), // funnel 1 completes; expiry at t = 1300 s
      ev(4, 4000, "view"), ev(5, 4100, "click"), ev(6, 4200, "purchase"))
    val expected = List((1, 100L), (2, 200L), (3, 300L),
      (1, 4000L), (2, 4100L), (3, 4200L))
    def fmt(s: FunnelStream.FunnelStage) = (s.stage, s.ts.getTime / 1000)
    // single-shot batch (no watermark) agrees with the event-time rule
    val gsB = state(None, None)
    assert(FunnelStream.transition(Some(ttlUs))(1L, events.iterator, gsB)
      .map(fmt).toList == expected)
    def run(packing: List[(List[FunnelStream.FEv], Long)]): List[(Int, Long)] = {
      var st: Option[FunnelStream.FunnelState] = None
      val out = List.newBuilder[(Int, Long)]
      (packing :+ ((Nil: List[FunnelStream.FEv]), 100000L)).foreach {
        case (evs, wmS) =>
          val gs = state(wmMs = wmS * 1000, st = st)
          out ++= FunnelStream.transition(Some(ttlUs))(1L, evs.iterator, gs)
            .map(fmt).toList
          st = gs.getOption // None after state.remove()
      }
      out.result()
    }
    val packings = List(
      List((events, 0L)),                              // everything buffers, one big drain
      events.map(e => (List(e), e.ts.getTime / 1000)), // one per batch, wm trailing
      List((events.take(3), 0L), (Nil, 2000L),         // reclamation via an empty batch...
        (events.drop(3), 2000L)),                      // ...then the post-expiry events
      List((events.take(3), 0L),
        (events.drop(3), 2000L)),                      // post-expiry events arrive IN the expiry batch
      List((events.take(4), 50L),
        (events.drop(4), 4050L)))                      // split mid-second-funnel
    // (watermarks in every packing trail the events they deliver: an
    // event below the watermark at arrival is LATE and dropped by policy,
    // which is a different — documented — behavior, not packing variance)
    packings.zipWithIndex.foreach { case (p, i) =>
      val got = run(p)
      assert(got == expected, s"packing $i diverged: $got")
    }
  }

  test("retention: one record per week, cohort fixed by the first finalized event") {
    // events arrive as already-buffered state (they arrived above the
    // watermark earlier); a timeout-style invocation with the watermark
    // advanced past them finalizes all three in time order
    val mondayUtc = 1704067200L // 2024-01-01 00:00:00 UTC, a Monday
    val st0 = RetentionStream.RetentionState(None, None, Seq(
      RetentionStream.RPending((mondayUtc + 15 * 86400) * 1000000L, 3L), // week 2
      RetentionStream.RPending((mondayUtc + 10 * 3600) * 1000000L, 1L),  // week 0
      RetentionStream.RPending((mondayUtc + 2 * 86400) * 1000000L, 2L))) // week 0 again
    val gs = TestGroupState.create[RetentionStream.RetentionState](
      optionalState = Optional.of(st0),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(4102444800000L), // far future
      hasTimedOut = false)
    val out = RetentionStream.transition(5L, Iterator.empty, gs).toList
    assert(out.map(_.week_n) == List(0, 2), out.toString)
    assert(out.forall(_.cohort_week.getTime == mondayUtc * 1000L),
      s"cohort must be the Monday of the first finalized event: $out")
    // O(1) dedup state: only the LAST emitted week is retained (weeks
    // finalize in non-decreasing order, so one week of memory dedupes)
    assert(gs.get.lastWeekUs.contains((mondayUtc + 14 * 86400) * 1000000L),
      s"state must hold the last emitted week start: ${gs.get.lastWeekUs}")
  }

  test("retention fails LOUD if a week ever finalizes out of order") {
    // the O(1) dedup is sound only because finalization is time-ordered;
    // if that invariant is ever violated the machine must throw, not
    // silently drop the record. Forge the impossible state directly: the
    // last emitted week is week 2, but a week-0 event finalizes.
    val mondayUtc = 1704067200L // 2024-01-01 00:00:00 UTC, a Monday
    val st0 = RetentionStream.RetentionState(
      Some(mondayUtc * 1000000L),
      Some((mondayUtc + 14 * 86400) * 1000000L), // last emitted: week 2
      Seq(RetentionStream.RPending((mondayUtc + 3600) * 1000000L, 9L))) // week 0
    val gs = TestGroupState.create[RetentionStream.RetentionState](
      optionalState = Optional.of(st0),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(4102444800000L), // far future
      hasTimedOut = false)
    val e = intercept[IllegalStateException] {
      RetentionStream.transition(5L, Iterator.empty, gs).toList
    }
    assert(e.getMessage.contains("finalization order violated"), e.getMessage)
  }
}
