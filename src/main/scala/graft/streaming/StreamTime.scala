package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.GroupState

/** Time plumbing shared by the stateful streaming operators (funnel,
  * retention, sessions, EWMA) — one definition of the micros conversions
  * and the batch-vs-streaming watermark probe, so a precision or
  * batch-detection fix lands everywhere at once. */
private[streaming] object StreamTime {

  /** Epoch micros of a Timestamp, preserving sub-millisecond digits. */
  def us(t: Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000

  /** Inverse of [[us]]. */
  def tsFromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** Current watermark in epoch micros, or Long.MaxValue in BATCH mode —
    * getCurrentWatermarkMs THROWS when no watermark is set, which is
    * exactly the batch case, where "everything is final" (+∞) is the
    * correct reading. */
  def watermarkUs(state: GroupState[_]): Long =
    scala.util.Try(state.getCurrentWatermarkMs()).toOption
      .map(_ * 1000L).getOrElse(Long.MaxValue)
}
