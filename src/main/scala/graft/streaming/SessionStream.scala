package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the q98 sessionized conversion rate — the one
  * round-5 batch analytic that lacked a streaming counterpart.
  *
  * Unlike the funnel/retention/EWMA machines this needs NO custom state:
  * Spark's built-in `session_window` aggregation is itself streamable,
  * so batch and streaming share the LITERAL same aggregation code —
  * [[sessions]] is q98's first stage, and q98 calls it. Under a
  * watermark in append mode, a (session, user) row is emitted exactly
  * once, when the watermark passes the session's close (no on-time event
  * can extend or re-open it); state per key is one open session window,
  * expired by the watermark — bounded by concurrently-open sessions,
  * never by stream history.
  *
  * The daily conversion rollup ([[dailyConversion]]) is stateless over
  * finalized session records, so a deployment runs it either as a
  * `foreachBatch` over this stream's appends or as a batch query over
  * the session sink — SessionStreamSpec pins the streaming-emitted
  * sessions (and the rollup over them) bit-equal to the q98 batch path.
  */
object SessionStream {

  /** One row per (5-minute-gap session, user): its start and whether it
    * converted (contained a purchase). Batch or streaming input; q98's
    * first stage verbatim. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      .select(col("w").getField("start").as("session_start"),
        col("user_id"), col("converted"))

  /** Watermarked streaming entry point: append-mode finalized sessions. */
  def sessions(events: DataFrame, watermark: String): DataFrame =
    sessions(events.withWatermark("ts", watermark))

  /** q98's second stage verbatim: per-day session count, conversions and
    * conversion rate over finalized session records. Stateless — safe as
    * a batch rollup over the streaming session sink. */
  def dailyConversion(sessions: DataFrame): DataFrame =
    sessions
      .select(to_date(col("session_start")).cast("timestamp").as("day"),
        col("converted"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"),
        (sum(col("converted")).cast("double") / count(lit(1))).as("conversion_rate"))
}
