package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}
import graft.operators.EventWindows

class StatefulSessionsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf0001)

  test("batch mode without cap: closed sessions match session_window minus each user's open tail") {
    val custom = StatefulSessions.sessions(events).toDF()
      .select(col("user_id"), col("session_start"), col("n_events"))
    val reference = EventWindows.sessions(events) // user_id, session_start, n_events
    // the custom operator keeps each user's LAST session open (no
    // watermark in batch), so reference minus its per-user latest session
    // should equal the custom output
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("session_start").desc)
    val refClosed = reference
      .withColumn("rn", row_number().over(w)).filter(col("rn") > 1).drop("rn")
    assert(custom.except(refClosed).isEmpty && refClosed.except(custom).isEmpty)
  }

  test("cap splits long sessions and labels the close reason") {
    import spark.implicits._
    // one user, 10 events 1s apart: a single gap-session that the cap=3
    // must split into 3+3+3 closed + 1 open
    val dense = (0 until 10).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000), 1L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val capped = StatefulSessions.sessions(dense, maxEvents = 3).collect()
    assert(capped.length == 3, capped.mkString(";"))
    assert(capped.forall(s => s.n_events == 3 && s.closed_by == "cap"))
  }

  test("streaming: watermark timeout flushes the final sessions") {
    val dir = Files.createTempDirectory("graft-fmgws").toString
    events.write.mode("overwrite").parquet(dir)
    // marker far in the future advances the watermark past every session
    events.limit(1).withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "40 days")
    val q = StatefulSessions.sessions(src).toDF().writeStream
      .format("memory").queryName("fmgws_out").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("fmgws_out")
      .select(col("user_id"), col("session_start"), col("n_events"))
    val want = EventWindows.sessions(events)
    // every real session must eventually be emitted (marker's own session
    // may stay open)
    assert(want.except(got).isEmpty,
      s"missing sessions: ${want.except(got).count()}")
  }
}
