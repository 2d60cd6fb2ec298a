package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

/** Streaming twin of the q86 transition matrix: per-user event-type
  * BIGRAM records (prev → next) emitted as each consecutive pair becomes
  * final, keyed by user via flatMapGroupsWithState.
  *
  * Exactness argument (the funnel's, applied to pairs): events buffer
  * until the watermark passes them, then finalize in ascending
  * (ts, event_id) order — identical to the ORDER BY under q86's lag()
  * window — and each finalized event pairs with the PREVIOUSLY finalized
  * one. Late arrivals (below the watermark) are dropped by the standard
  * policy rather than finalized out of order, so a bigram record is
  * emitted exactly once and never retracted.
  *
  * Long-lived state is ONE finalized event per user (the `last` carry) —
  * the sequence analogue of the funnel's three timestamps — plus only the
  * buffer inside the watermark horizon, which drains on every advance (an
  * event-time timeout re-invokes idle users). `last` persists for the
  * key's lifetime by design: removing it would make the next event look
  * like a chain start and silently swallow one transition, the same class
  * of bug as the funnel's remove-vs-tombstone.
  *
  * Output is append-mode monotone, so the matrix itself stays a legal
  * downstream streaming aggregation (groupBy(prev, next).count). In BATCH
  * mode (watermark = +∞) everything finalizes in one invocation per user
  * and the record set equals q86's lag() pairs exactly — BigramStreamSpec
  * pins both runs.
  */
object BigramStream {

  final case class BEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)

  final case class BPending(us: Long, eventId: Long, tpe: String) extends Timed

  final case class BigramState(last: Option[BPending], buf: Seq[BPending])

  /** One finalized transition for a user, emitted exactly once; `ts` is
    * the time of the LATER event of the pair. */
  final case class Bigram(user_id: Long, prev: String, next: String, ts: Timestamp)

  import StreamTime.{us, tsFromUs}

  /** The state-transition function (shared by batch and streaming runs). */
  def transition(
      userId: Long, events: Iterator[BEv],
      state: GroupState[BigramState]): Iterator[Bigram] = {
    // admission/drain/ordering/timeout semantics live in WatermarkBuffer
    // (shared with funnel/retention/ewma); this machine is the fold
    val wmUs = StreamTime.watermarkUs(state)
    val st0 = state.getOption.getOrElse(BigramState(None, Nil))
    val fresh = WatermarkBuffer.admit(
      events.map(e => BPending(us(e.ts), e.event_id, e.event_type)), wmUs)
    val (ready, still) = WatermarkBuffer.drain(st0.buf, fresh, wmUs)
    var last = st0.last
    val out = ready.flatMap { e =>
      val rec = last.map(l => Bigram(userId, l.tpe, e.tpe, tsFromUs(e.us)))
      last = Some(e)
      rec
    }
    state.update(BigramState(last, still))
    WatermarkBuffer.armAtEarliest(state, still, wmUs)
    out.iterator
  }

  /** Finalized bigram records for a batch or streaming events frame
    * (schema of Tables.events). Streaming callers must set a watermark. */
  def bigrams(events: DataFrame): Dataset[Bigram] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[BEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition)
  }

  /** Watermarked streaming entry point. */
  def bigrams(events: DataFrame, watermark: String): Dataset[Bigram] =
    bigrams(events.withWatermark("ts", watermark))

  /** q86's matrix shape from the bigram records (counts only — the
    * probability column divides these downstream). */
  def bigramCounts(recs: Dataset[Bigram]): DataFrame =
    recs.groupBy(col("prev"), col("next")).agg(count(lit(1)).as("n"))
}
