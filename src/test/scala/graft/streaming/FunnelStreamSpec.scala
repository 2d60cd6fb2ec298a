package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** Batch-equivalence for the streaming funnel: the same transition code
  * runs (a) in batch mode against q72's min/join cascade, and (b) as a
  * real multi-micro-batch stream whose finalized stages must match the
  * batch result exactly once the watermark has passed everything. */
class FunnelStreamSpec extends SparkSpec {

  /** q72's per-user stage frames, computed independently of FunnelStream. */
  private def expectedStages(ev: DataFrame): Set[(Long, Int, java.sql.Timestamp)] = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    def stage(tpe: String, prev: DataFrame) =
      ev.filter(col("event_type") === tpe)
        .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
        .filter(col("ts") > col("pt"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val c = stage("click", v)
    val p = stage("purchase", c)
    def toSet(df: DataFrame, s: Int) =
      df.collect().map(r => (r.getLong(0), s, r.getTimestamp(1))).toSet
    toSet(v, 1) ++ toSet(c, 2) ++ toSet(p, 3)
  }

  test("batch run of the funnel state machine equals q72's min/join cascade") {
    val ev = Tables.events(spark, sf0001)
    val got = FunnelStream.funnelStages(ev)
      .collect().map(s => (s.user_id, s.stage, s.ts)).toSet
    val want = expectedStages(ev)
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing")
    // and the headline counts match the three funnel numbers
    val counts = FunnelStream.funnelCounts(FunnelStream.funnelStages(ev))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(1) == want.count(_._2 == 1))
    assert(counts(2) == want.count(_._2 == 2))
    assert(counts(3) == want.count(_._2 == 3))
  }

  test("streaming funnel finalizes to the batch result across micro-batches") {
    val dir = Files.createTempDirectory("graft-funnel").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    // files are not time-ordered, so the watermark delay must cover the
    // data span; the far-future marker (inert user/type) then pushes the
    // watermark past every real event so all stages finalize
    batch.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("error"))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = FunnelStream.funnelStages(src, "40 days")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("funnel_out")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    val want = expectedStages(batch)
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing " +
        s"of ${want.size} expected stage records")
    // append-mode emission is exactly-once per stage record
    assert(spark.table("funnel_out").filter(col("user_id") >= 0).count() == want.size)
  }

  test("a user with events after completing the funnel emits no duplicate stages") {
    // Four micro-batches, each advancing the watermark (delay 1h):
    //   batch 1: user 10's view→click→purchase buffer; marker pushes wm to 9h
    //   batch 2: inert marker — the timeout finalizes all three stages, the
    //            funnel COMPLETES (old code: state.remove() here); wm → 19h
    //   batch 3: user 10 keeps browsing — view @ 21h (above the watermark)
    //            buffers; with removed state that buffer is FRESH state
    //   batch 4: inert marker; the timeout finalizes the 21h view. Removed
    //            state re-emits stage 1 (→ 4 records); the tombstone keeps
    //            the output at exactly the 3 original stages.
    val dir = Files.createTempDirectory("graft-funnel-post").toString
    val spark0 = spark
    import spark0.implicits._
    def hours(h: Double): java.sql.Timestamp =
      new java.sql.Timestamp((h * 3600 * 1000).toLong)
    def write(rows: (Long, Double, Long, String)*): Unit =
      rows.toSeq
        .map { case (id, h, u, t) => (id, hours(h), u, t) }
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    write((1L, 1.0, 10L, "view"), (2L, 2.0, 10L, "click"),
      (3L, 3.0, 10L, "purchase"), (90L, 10.0, -1L, "error"))
    write((91L, 20.0, -1L, "error"))
    write((4L, 21.0, 10L, "view"), (92L, 30.0, -1L, "error"))
    write((93L, 40.0, -1L, "error"))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, "each micro-batch needs its own file")
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = FunnelStream.funnelStages(src, "1 hour")
      .writeStream.format("memory").queryName("funnel_post")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("funnel_post").filter(col("user_id") === 10L)
      .collect().map(r => (r.getInt(1), r.getTimestamp(2).getTime / 3600000.0)).toSet
    assert(got == Set((1, 1.0), (2, 2.0), (3, 3.0)),
      s"expected exactly the 3 original stages, got $got")
  }

  test("tombstone TTL reclaims completed-user state and the re-entry caveat fires") {
    // Same four-micro-batch timeline as the tombstone test, but with a
    // 5-hour tombstone TTL: user 10 completes at 3h; when the watermark
    // reaches 9h (batch 2) it is already past 3h + 5h, so the tombstone
    // is REMOVED — state is reclaimed, which is the point of the TTL.
    // The post-purchase view at 21h then sees empty state and re-enters
    // the funnel at stage 1: the DOCUMENTED caveat, asserted here as an
    // extra (1, 21h) record. Run with no TTL, the same timeline emits
    // exactly the 3 original stages (previous test) — together the two
    // tests pin both sides of the exactness-for-state trade.
    val dir = Files.createTempDirectory("graft-funnel-ttl").toString
    val spark0 = spark
    import spark0.implicits._
    def hours(h: Double): java.sql.Timestamp =
      new java.sql.Timestamp((h * 3600 * 1000).toLong)
    def write(rows: (Long, Double, Long, String)*): Unit =
      rows.toSeq
        .map { case (id, h, u, t) => (id, hours(h), u, t) }
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    write((1L, 1.0, 10L, "view"), (2L, 2.0, 10L, "click"),
      (3L, 3.0, 10L, "purchase"), (90L, 10.0, -1L, "error"))
    write((91L, 20.0, -1L, "error"))
    write((4L, 21.0, 10L, "view"), (92L, 30.0, -1L, "error"))
    write((93L, 40.0, -1L, "error"))
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val ttlUs = 5L * 3600 * 1000000 // 5 hours of event time past the purchase
    val q = FunnelStream.funnelStages(src, "1 hour", ttlUs)
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("funnel_ttl").filter(col("user_id") === 10L)
      .collect().map(r => (r.getInt(1), r.getTimestamp(2).getTime / 3600000.0)).toSet
    assert(got == Set((1, 1.0), (2, 2.0), (3, 3.0), (1, 21.0)),
      s"expected the 3 stages plus the documented re-entry record, got $got")
    // the re-entry rule is EVENT-TIME-only, so a single-pass batch run
    // over the same events (no watermark, no micro-batches) must produce
    // the identical stage set — TTL does not break batch equivalence
    val batchGot = FunnelStream
      .funnelStages(spark.read.parquet(dir), Some(ttlUs))
      .filter(col("user_id") === 10L)
      .collect().map(s => (s.stage, s.ts.getTime / 3600000.0)).toSet
    assert(batchGot == got,
      s"batch TTL run diverged from streaming: $batchGot vs $got")
  }

  test("forgetUsers scrubs a user's records from a finalized sink; replay no-op") {
    // the record-sink deletion mechanic behind q205: a parquet sink of
    // stage records (with a streaming-style inert marker row), forget a
    // user, and the survivors — including the marker — are untouched
    val dir = Files.createTempDirectory("graft-funnel-forget").toString + "/sink"
    import spark.implicits._
    Seq(
      (1L, 1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (2L, 1, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      (3L, 1, java.sql.Timestamp.valueOf("2024-01-01 02:00:00")),
      (-1L, 1, java.sql.Timestamp.valueOf("2025-01-01 00:00:00")) // marker
    ).toDF("user_id", "stage", "ts").write.parquet(dir)
    val tomb = Seq(1L, 99L).toDF("user_id") // 99 was never recorded
    ServedEventStreams.forgetUsers(spark, dir, tomb)
    val rows = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((2L, 1), (3L, 1), (-1L, 1)),
      s"forget must scrub exactly user 1 and spare the marker: $rows")
    // served read excludes the marker as always
    assert(ServedEventStreams.records(spark, dir).count() == 2)
    // re-deleting (incl. a never-recorded key) is a state no-op
    ServedEventStreams.forgetUsers(spark, dir, tomb)
    assert(spark.read.parquet(dir)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet == rows,
      "replayed forget changed the sink")
  }
}
