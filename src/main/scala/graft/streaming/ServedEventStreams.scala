package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Build-once REAL Structured-Streaming runs of the five
  * flatMapGroupsWithState machines (funnel, retention, EWMA, bigram,
  * sessionizer) over the corpus events table, persisting their
  * append-mode records for the q192–q196 state-served reads.
  *
  * The five machines were the last spec-proven-only state surfaces in
  * the tree: every foreachBatch-maintained family faces the driver's
  * DuckDB hash gate through a registered serving read (q180–q191), but
  * the fMGWS machines' batch-equivalence lived only in their specs.
  * This runner closes that asymmetry the same way: run the machine as a
  * genuine multi-leg stream — file source, watermark, event-time
  * timeouts, append-mode parquet sink with checkpoint — and register a
  * read over the persisted records whose oracle is the batch twin's SQL
  * VERBATIM (q72/q73/q77/q86/q98), so the driver re-proves
  * stream == batch — including WatermarkBuffer's admission/drain order —
  * cross-engine every round, not just in ScalaTest.
  *
  * Leg protocol (three separate `start()`s against ONE checkpoint — each
  * boundary is a genuine restart that reloads fMGWS state):
  *   leg 1: events with ts <= corpus time-midpoint (one parquet file →
  *          one micro-batch, so every event is admitted regardless of
  *          intra-file order; the watermark advances only AFTER the
  *          batch);
  *   leg 2: events with ts > midpoint — all above the leg-1 watermark
  *          (midpoint − delay) by construction, so nothing is late;
  *   leg 3: one far-future inert marker row (user −1, type 'error',
  *          ts = max + 365 d) that pushes the watermark past every real
  *          event, draining all buffers/timeouts (the FunnelStreamSpec
  *          device). The marker itself stays above the final watermark
  *          and never finalizes; reads filter user_id >= 0 anyway.
  *
  * Scale posture: this is the deployment shape — the stream maintains
  * per-key state bounded by the watermark horizon (the machines' own
  * documented contracts), the sink accumulates finalized records
  * exactly once (file-sink commit log across restarts), and the
  * analytics read the RECORDS, never replaying the event history. The
  * build is memoized per (session, corpus, machine) so timed bench reps
  * pay only the serving read.
  */
object ServedEventStreams {

  /** Run `mk` (a watermarked streaming transform of an events frame) as
    * the three-leg restart protocol above; returns the sink directory of
    * committed append-mode records. Memoized per (session, corpus,
    * `name`). */
  def stagesDir(s: SparkSession, d: String, name: String)(
      mk: DataFrame => DataFrame): String =
    graft.AnnSubstrate.getOrBuild(s, s"$name|$d/events.parquet",
        protectNew = false) {
      val events = graft.Tables.events(s, d)
      // bounded one-row metadata probe: the wave boundary + marker time
      val mm = events.agg(min(col("ts")), max(col("ts"))).collect()(0)
      require(!mm.isNullAt(0), s"events table at $d is empty")
      val (tminMs, tmaxMs) =
        (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
      val midTs = new Timestamp((tminMs + tmaxMs) / 2)
      val markerTs = new Timestamp(tmaxMs + 365L * 86400000L)
      val root = graft.AnnSubstrate.deleteOnExit(
        Files.createTempDirectory(s"graft_$name").toString)
      val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
      val schema = events.schema
      def leg(write: => Unit): Unit = {
        write
        val q = mk(s.readStream.schema(schema).parquet(in))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      leg(events.filter(col("ts") <= lit(midTs))
        .coalesce(1).write.mode("append").parquet(in))
      leg(events.filter(col("ts") > lit(midTs))
        .coalesce(1).write.mode("append").parquet(in))
      leg(events.limit(1)
        .withColumn("ts", lit(markerTs))
        .withColumn("user_id", lit(-1L))
        .withColumn("event_type", lit("error"))
        .coalesce(1).write.mode("append").parquet(in))
      out
    }

  /** The committed sink records, inert marker rows excluded. */
  def records(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(dir).filter(col("user_id") >= 0)

  /** Right-to-be-forgotten against a finalized record sink — the
    * keyed-1:1 deletion mechanic (q199/q202/q203) applied to event
    * analytics: the tombstoned users' rows anti-join out of the
    * persisted records under the two-rename swap. The swap rewrites the
    * sink as plain parquet, CONSUMING the streaming commit log
    * (_spark_metadata) — deliberate: a forget runs against a RETIRED
    * sink generation with the stream stopped (the offline-op contract
    * every forget shares), which is also the file-sink compaction
    * convention. The machine's in-flight per-user state is bounded and
    * expires with the watermark; nothing can re-emit a forgotten user
    * unless new events arrive, and the ingest-side tombstone filter
    * owns that half. Marker rows (user −1) are never tombstoned and
    * pass through. Re-running with the same tombstones is a no-op. */
  def forgetUsers(s: SparkSession, dir: String,
      tombstones: DataFrame): Unit = {
    val tomb = tombstones.select(col("user_id")).distinct()
      .localCheckpoint(true) // read after the swap deletes its source
    val survivors = s.read.parquet(dir)
      .join(broadcast(tomb), Seq("user_id"), "left_anti")
      .localCheckpoint(true) // materialize before the swap
    CorpusStateStream.swapState(s, dir)(tmp =>
      survivors.write.mode("overwrite").parquet(tmp))
  }

  /** Shared watermark delay: any value works for the time-split waves
    * (one file = one batch, so admission never races the watermark);
    * 40 days mirrors the stream specs and leaves the +365 d marker a
    * 325-day margin past max(ts) + delay. */
  val Delay = "40 days"
}
