package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.operators.EventWindows

/** Drives the streaming transforms with a real file source + memory sink
  * and checks them against their batch twins (same code path, so the
  * assertion is about streaming mechanics: watermarks, state, modes). */
class EventStreamsSpec extends SparkSpec {

  /** Copy sf0.001 events into a temp dir to act as a streaming source. */
  private def stagedEvents(): (String, DataFrame) = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    (dir, batch)
  }

  test("streaming tumbling windows equal the batch result (complete mode)") {
    val (dir, batch) = stagedEvents()
    val src = spark.readStream.schema(batch.schema).parquet(dir)
    val q = EventStreams.tumbling(src).writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("tumbling_out")
    val want = EventWindows.tumbling(batch)
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("session windows finalize in append mode once the watermark passes") {
    val (dir, batch) = stagedEvents()
    // The staged files are not time-ordered, so the watermark delay must
    // cover the full data span (1 month) or mid-session events arriving in
    // later micro-batches would be dropped as late. The marker then has to
    // land beyond max_ts + delay to finalize every real session.
    import org.apache.spark.sql.functions._
    batch.limit(1).withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q2 = EventStreams.sessions(src, "40 days")
      .writeStream.format("memory").queryName("session_out2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got = spark.table("session_out2")
    // all original sessions must be emitted (the marker's own session may
    // still be open); compare against the batch twin restricted to them
    val want = EventWindows.sessions(batch)
    assert(got.count() >= want.count())
    assert(want.except(got).isEmpty, "a finalized session diverged from batch")
  }

  test("dedupWithinWatermark drops re-delivered events, keeps state bounded") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val batch = Tables.events(spark, sf0001).limit(200)
    batch.write.mode("overwrite").parquet(dir)
    batch.write.mode("append").parquet(dir) // duplicate delivery
    val src = spark.readStream.schema(batch.schema).parquet(dir)
    val q = EventStreams.dedupWithinWatermark(src, "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_out").count() == 200)
  }

  test("streaming sliding windows equal the batch result (complete mode)") {
    val (dir, batch) = stagedEvents()
    val src = spark.readStream.schema(batch.schema).parquet(dir)
    val q = EventStreams.sliding(src).writeStream
      .format("memory").queryName("sliding_out").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sliding_out")
    val want = graft.operators.EventWindows.sliding(batch)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("stream-stream interval join equals the batch range join") {
    val (dir, batch) = stagedEvents()
    val src = spark.readStream.schema(batch.schema).parquet(dir)
    // one micro-batch (no maxFilesPerTrigger): every pair is discovered
    // before any state eviction, so the result must be the FULL batch join
    val q = EventStreams.errorFollowers(src).writeStream
      .format("memory").queryName("followers_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("followers_out")
    val want = EventStreams.errorFollowers(batch) // same code path, batch run
    assert(got.count() > 0, "no join matches produced")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "stream-stream join diverged from its batch twin")
  }

  test("stateless enrich runs in append mode without watermark") {
    val (dir, batch) = stagedEvents()
    val src = spark.readStream.schema(batch.schema).parquet(dir)
    val q = EventStreams.enrich(src).writeStream
      .format("memory").queryName("enrich_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("enrich_out")
    assert(got.count() == batch.count())
    assert(got.filter("prop_k IS NULL").count() == 0)
  }

  test("stream-static dimension join equals the batch join, keeps unmatched rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (dir, batch) = stagedEvents()
    // static user dimension covering only part of the id space, so the
    // left-join's keep-unmatched contract is actually exercised
    val dim = batch.select($"user_id").distinct()
      .filter($"user_id" % 2 === 0)
      .withColumn("segment", concat(lit("seg"), $"user_id" % 3))
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.enrichWithDim(src, dim).writeStream
      .format("memory").queryName("dimjoin_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dimjoin_out")
    val want = EventStreams.enrichWithDim(batch, dim)
    assert(got.count() == batch.count(), "enrichment must never drop events")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.filter($"segment".isNull).count() ==
      batch.filter($"user_id" % 2 =!= 0).count())
  }

  test("forgetUsers on every machine's record sink: marker passthrough, replay no-op") {
    // the five stream-served analytics share ServedEventStreams.forgetUsers
    // verbatim; what differs per machine is the record SCHEMA the sink
    // holds. One case per machine (funnel's lives in FunnelStreamSpec):
    // tombstoned users' rows scrub whole, the inert marker row (user -1,
    // never tombstonable — the tombstone set comes from real events)
    // passes through, survivors ride untouched, and a replay is a no-op.
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val sinks: Seq[(String, DataFrame)] = Seq(
      "retention" -> Seq((1L, ts, 0), (2L, ts, 1), (-1L, ts, 0))
        .toDF("user_id", "cohort_week", "week_n"),
      "ewma" -> Seq((1L, ts, 2, 1.5), (2L, ts, 1, 2.0), (-1L, ts, 1, 0.0))
        .toDF("user_id", "day", "n_events", "ewma"),
      "bigram" -> Seq((1L, "view", "click", ts), (2L, "view", "view", ts),
          (-1L, "error", "error", ts))
        .toDF("user_id", "prev", "next", "ts"),
      "session" -> Seq((ts, 1L, 0), (ts, 2L, 1), (ts, -1L, 0))
        .toDF("session_start", "user_id", "converted"))
    val tomb = Seq(1L, 99L).toDF("user_id") // 99 was never recorded
    sinks.foreach { case (name, df) =>
      val dir = Files.createTempDirectory(s"graft-$name-forget").toString + "/sink"
      df.write.parquet(dir)
      ServedEventStreams.forgetUsers(spark, dir, tomb)
      val users = spark.read.parquet(dir)
        .select(org.apache.spark.sql.functions.col("user_id"))
        .collect().map(_.getLong(0)).toSet
      assert(users == Set(2L, -1L),
        s"$name: forget must scrub exactly user 1 and spare the marker: $users")
      assert(ServedEventStreams.records(spark, dir).count() == 1,
        s"$name: served read excludes the marker")
      val before = spark.read.parquet(dir).collect().map(_.toString).sorted
      ServedEventStreams.forgetUsers(spark, dir, tomb)
      val after = spark.read.parquet(dir).collect().map(_.toString).sorted
      assert(before.sameElements(after), s"$name: replayed forget changed the sink")
    }
  }
}
