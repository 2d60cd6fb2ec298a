package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Direct contract tests for the shared drain core. The machine suites
  * (funnel/retention/bigram/ewma + TransitionSpec's packing-invariance
  * properties) prove the core through its users; these pin the primitive
  * itself, so a contract change fails HERE with a readable message
  * rather than four suites deep. */
class WatermarkBufferSpec extends AnyFunSuite {

  private case class P(us: Long, eventId: Long) extends Timed

  test("admit drops strictly-below-watermark arrivals, batch admits all") {
    val evs = Seq(P(5, 1), P(10, 2), P(15, 3))
    assert(WatermarkBuffer.admit(evs.iterator, wmUs = 10) == Seq(P(10, 2), P(15, 3)))
    // batch sentinel: EVERYTHING admits (Long.MaxValue means "no watermark")
    assert(WatermarkBuffer.admit(evs.iterator, Long.MaxValue) == evs)
    // wm = 0 (stream start): nothing is late yet
    assert(WatermarkBuffer.admit(evs.iterator, 0) == evs)
  }

  test("drain finalizes strictly below the watermark, in (us, eventId) order") {
    val buffered = Seq(P(9, 7), P(3, 2))
    val fresh = Seq(P(3, 1), P(11, 4))
    val (ready, still) = WatermarkBuffer.drain(buffered, fresh, wmUs = 10)
    // ties on us break by eventId — the total order every fold relies on
    assert(ready == Seq(P(3, 1), P(3, 2), P(9, 7)))
    assert(still == Seq(P(11, 4)))
    // the boundary is STRICT: an event AT the watermark stays pending
    // (a wm-equal event could still be joined by a peer at the same us)
    val (r2, s2) = WatermarkBuffer.drain(Nil, Seq(P(10, 1)), wmUs = 10)
    assert(r2.isEmpty && s2 == Seq(P(10, 1)))
  }

  test("batch mode finalizes everything in one drain") {
    val (ready, still) = WatermarkBuffer.drain(
      Seq(P(2, 1)), Seq(P(1, 1)), Long.MaxValue)
    assert(ready == Seq(P(1, 1), P(2, 1)) && still.isEmpty)
  }

  test("horizonClosed: closed at/after the horizon, and always in batch") {
    assert(!WatermarkBuffer.horizonClosed(horizonUs = 100, wmUs = 99))
    assert(WatermarkBuffer.horizonClosed(horizonUs = 100, wmUs = 100))
    assert(WatermarkBuffer.horizonClosed(horizonUs = 100, Long.MaxValue))
  }

  test("timeout lands on the first millisecond tick after the event's own") {
    // armAtUs sets ms = us/1000 + 1: strictly after the event's ms, so
    // the watermark tick that fires it can also finalize the event
    var armed = -1L
    val probe = new org.apache.spark.sql.streaming.GroupState[Unit] {
      def exists = false; def get = (); def getOption = None
      def update(s: Unit): Unit = (); def remove(): Unit = ()
      def hasTimedOut = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = { armed = t }
      def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    WatermarkBuffer.armAtUs(probe, 1500999)
    assert(armed == 1501, s"expected ms 1501, armed $armed")
    // earliest-pending form: no-op in batch mode and on empty buffers
    armed = -1
    WatermarkBuffer.armAtEarliest(probe, Seq(P(2000000, 1)), Long.MaxValue)
    assert(armed == -1, "armed a timeout in batch mode")
    WatermarkBuffer.armAtEarliest(probe, Nil, 1000)
    assert(armed == -1, "armed a timeout with nothing pending")
    WatermarkBuffer.armAtEarliest(probe, Seq(P(2000000, 1), P(3000000, 2)), 1000)
    assert(armed == 2001, "expected the EARLIEST pending event's tick")
  }
}
