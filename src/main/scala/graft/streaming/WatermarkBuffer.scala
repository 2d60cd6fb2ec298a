package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** An item buffered until the watermark finalizes it: event-time micros
  * plus the event-id tiebreaker that makes finalization order total.
  * The per-machine Pending case classes implement this so the drain core
  * below can order and split them without per-machine lambdas — and
  * without changing their checkpointed state schemas (a trait mixin adds
  * no constructor fields, so the encoders are untouched). */
private[streaming] trait Timed {
  def us: Long
  def eventId: Long
}

/** The finalize-below-watermark core shared by the ordered state
  * machines (funnel, retention, bigram) and, in its horizon form, the
  * whole-group-atomic ones (EWMA day close).
  *
  * Four machines independently grew this logic in rounds 4-6; the
  * subtle parts — the Long.MaxValue batch sentinel, the strict `us <
  * wm` finalization cut, the late-drop admission rule, the (us,
  * event_id) total order, and the micros→ms timeout conversion — are
  * exactly the parts a fix must land in everywhere at once, so they
  * live here ONCE and per-machine code is just the fold over finalized
  * events. TransitionSpec's packing-invariance properties and the
  * streaming/batch-equivalence suites pin the semantics across the
  * refactor.
  *
  * The contract (the module's exactness argument, stated once):
  *  - an arrival below the watermark is beyond-horizon late and is
  *    DROPPED at admission (it could only finalize out of time order);
  *  - an admitted item FINALIZES in the first invocation whose
  *    watermark strictly exceeds its event time, in ascending
  *    (us, eventId) order — so per key, folds see a globally
  *    time-ordered event sequence;
  *  - in batch mode (no watermark ⇒ [[StreamTime.watermarkUs]] returns
  *    Long.MaxValue) everything admits and everything finalizes in the
  *    group's single invocation, which is what makes the same
  *    transition code the batch twin;
  *  - a non-empty pending buffer arms an event-time timeout at the
  *    earliest item's finalization instant, so draining never depends
  *    on further arrivals for the key.
  */
private[streaming] object WatermarkBuffer {

  /** Admission: the standard watermark late policy. Keeps an arrival iff
    * its event time is at/above the watermark (batch admits all). */
  def admit[P <: Timed](arrivals: Iterator[P], wmUs: Long): Seq[P] =
    arrivals.filter(p => p.us >= wmUs || wmUs == Long.MaxValue).toSeq

  /** Split buffered + admitted items into (finalizable in (us, eventId)
    * order, still-pending). */
  def drain[P <: Timed](buffered: Seq[P], fresh: Seq[P], wmUs: Long): (Seq[P], Seq[P]) = {
    val (ready, still) = (buffered ++ fresh).partition(_.us < wmUs)
    (ordered(ready), still)
  }

  /** The total finalization order. */
  def ordered[P <: Timed](xs: Seq[P]): Seq[P] = xs.sortBy(p => (p.us, p.eventId))

  /** Arm the re-invocation at the earliest pending item's finalization
    * instant (no-op in batch mode or with nothing pending): the +1 ms
    * makes the timeout fire strictly after the event's own millisecond,
    * i.e. the first watermark tick that can finalize it. */
  def armAtEarliest[P <: Timed](state: GroupState[_], still: Seq[P], wmUs: Long): Unit =
    if (still.nonEmpty && wmUs != Long.MaxValue)
      armAtUs(state, still.map(_.us).min)

  /** Arm an event-time timeout at micros instant `atUs` (ms floor + 1). */
  def armAtUs(state: GroupState[_], atUs: Long): Unit =
    state.setTimeoutTimestamp(atUs / 1000L + 1L)

  /** Horizon machines (whole-group atomic close — the EWMA day): nothing
    * finalizes until the watermark reaches the KEY's horizon, then
    * everything does at once. */
  def horizonClosed(horizonUs: Long, wmUs: Long): Boolean =
    wmUs == Long.MaxValue || wmUs >= horizonUs
}
