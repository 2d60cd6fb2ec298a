package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.EventWindows

/** Structured-Streaming wiring for the event-time transforms.
  *
  * The aggregation logic lives ONCE in [[graft.operators.EventWindows]]
  * (batch-tested against the DuckDB oracle); here we only add what
  * streaming needs on top: a watermark bounding state, and (for dedup)
  * state-expiring variants. This mirrors the reference's
  * stream-vs-batch split (SURVEY.md §2.8) but fixes its unbounded-state
  * defect (§4.3-2): every stateful operator below carries a watermark.
  *
  * Scale posture: state per key is bounded by the watermark horizon, so
  * a 1000-executor job holds |active windows| × |keys| state, not the
  * stream's history. Late events beyond the watermark are dropped —
  * the documented, observable policy.
  */
object EventStreams {

  /** Tumbling 1 h counts per event_type, late data bounded by `watermark`. */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    EventWindows.tumbling(events.withWatermark("ts", watermark))

  /** Sliding 1 h / 30 min windows with watermark. */
  def sliding(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    EventWindows.sliding(events.withWatermark("ts", watermark))

  /** Gap-based 5 min session windows per user with watermark. */
  def sessions(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    EventWindows.sessions(events.withWatermark("ts", watermark))

  /** Event dedup by id with state expiry — the fix for the reference's
    * watermark-less dropDuplicates (code/Main.py:49, SURVEY.md §4.3-2):
    * state for an id is dropped once the watermark passes its event time,
    * so the dedup map cannot grow without bound. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Simple stateless enrichment usable in append mode at any rate:
    * parses the JSON props and classifies the event. Stateless ops need
    * no watermark and scale linearly. */
  def enrich(events: DataFrame): DataFrame =
    events
      .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("is_error", (col("event_type") === "error").cast("int"))

  /** Stream-static enrichment join: each micro-batch of the stream joins
    * a STATIC dimension (user → attributes), the standard lookup-table
    * enrichment. Stateless on the streaming side — no watermark, no state
    * store — and the static side broadcasts at dimension size per
    * micro-batch, so it composes with any downstream mode. The left join
    * keeps unmatched events flowing (enrichment must never drop data). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream interval join — the streaming twin of q42's batch
    * range join: every event of the same user within 10 minutes AFTER an
    * error event. Both inputs carry watermarks and the join condition
    * bounds event time on both sides, so Spark can evict buffered rows
    * once the watermark passes their interval: state is O(events inside
    * the horizon), never the stream's history. The equi-key (user_id)
    * keeps the join a hash join per micro-batch — the same
    * bounded-blow-up argument as the batch plan. */
  def errorFollowers(events: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val errors = events
      .filter(col("event_type") === "error")
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("a_event_id"))
      .withWatermark("a_ts", watermark)
    events.withWatermark("ts", watermark)
      .join(errors,
        col("user_id") === col("a_user") &&
        col("ts") > col("a_ts") &&
        col("ts") <= col("a_ts") + expr("INTERVAL 10 MINUTE"))
      .select(col("a_event_id"), col("event_id"), col("user_id"),
        col("a_ts"), col("ts"))
  }
}
