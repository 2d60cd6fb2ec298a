package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** Batch/streaming parity for the q98 sessionized conversion: the SAME
  * session_window aggregation (SessionStream.sessions — q98's first
  * stage, literally shared) runs as a multi-micro-batch stream in append
  * mode; its finalized session records, and the daily conversion rollup
  * over them, must equal the batch path exactly. */
class SessionStreamSpec extends SparkSpec {

  test("streaming session_window finalizes to the batch sessions exactly") {
    val dir = Files.createTempDirectory("graft-sessions").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    // files are not time-ordered, so the watermark delay must cover the
    // data span; the far-future inert marker then pushes the watermark
    // past every real session's close so everything finalizes
    batch.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("error"))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = SessionStream.sessions(src, "40 days")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("session_out").filter(col("user_id") >= 0)
    val want = SessionStream.sessions(batch)
    // exactly-once append emission: same multiset of (start, user, converted)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and the daily rollup over the streamed sessions IS q98's output
    val gotDaily = SessionStream.dailyConversion(got)
    val wantDaily = graft.SparkEntry.queries("q98_session_conversion")(spark, sf0001)
    assert(gotDaily.exceptAll(wantDaily).isEmpty && wantDaily.exceptAll(gotDaily).isEmpty)
  }

  test("a session spanning micro-batches is emitted once, merged, after its close") {
    // user 50: events at 0:00, 4:00, 8:00 (each within 5 min of the last)
    // arriving in three different micro-batches — the windows must MERGE
    // into one session [0:00, 13:00) with converted=1 (purchase mid-way);
    // a fourth batch's marker closes it. user 60's two events are 10 min
    // apart: two sessions, the second converted.
    val dir = Files.createTempDirectory("graft-session-merge").toString
    val spark0 = spark
    import spark0.implicits._
    def mins(m: Double): java.sql.Timestamp =
      new java.sql.Timestamp((m * 60 * 1000).toLong)
    def write(rows: (Long, Double, Long, String)*): Unit =
      rows.toSeq.map { case (id, m, u, t) => (id, mins(m), u, t, 1.0d) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    write((1L, 0.0, 50L, "view"), (10L, 0.0, 60L, "view"))
    write((2L, 4.0, 50L, "purchase"), (11L, 10.0, 60L, "purchase"))
    write((3L, 8.0, 50L, "view"))
    write((99L, 600.0, -1L, "error"))
    val schema = spark.read.parquet(dir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = SessionStream.sessions(src, "1 minute")
      .writeStream.format("memory").queryName("session_merge")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("session_merge").filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(1), r.getTimestamp(0).getTime / 60000.0, r.getInt(2)))
      .toSet
    assert(got == Set((50L, 0.0, 1), (60L, 0.0, 0), (60L, 10.0, 1)),
      s"expected one merged converted session for user 50 and a 2-session " +
        s"split for user 60, got $got")
  }
}
