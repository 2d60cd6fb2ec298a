package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkEntry, SparkSpec, Tables}

/** Batch-equivalence and multi-micro-batch behavior of the streaming
  * EWMA: same transition in batch mode must reproduce q77 bitwise; a
  * real stream must converge to the batch answer exactly once per
  * (user, day). */
class EwmaStreamSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getTimestamp(1)) -> (r.getInt(2), r.getDouble(3))

  test("batch run of the day machine equals q77's fold bitwise") {
    val got = EwmaStream.ewmaStages(Tables.events(spark, sf0001))
      .toDF().collect().map(key).toMap
    val want = SparkEntry.queries("q77_ewma_smoothing")(spark, sf0001)
      .collect().map(key).toMap
    assert(got.keySet == want.keySet,
      s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
    got.foreach { case (k, v) => assert(v == want(k), s"$k: $v != ${want(k)}") }
  }

  test("streaming EWMA finalizes each day exactly once, matching batch") {
    val dir = Files.createTempDirectory("graft-ewma").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    // far-future inert marker pushes the watermark past every real day
    batch.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EwmaStream.ewmaStages(src, "40 days")
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val outRows = spark.table("ewma_out").filter(col("user_id") >= 0).collect()
    val got = outRows.map(key).toMap
    val want = SparkEntry.queries("q77_ewma_smoothing")(spark, sf0001)
      .collect().map(key).toMap
    assert(outRows.length == want.size, "one record per (user, day), exactly once")
    assert(got == want,
      s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
  }

  test("arrivals to an already-closed day are dropped, never re-emitted") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val day0 = 0L
    // watermark far past day 0's end; no state (the day's record already
    // went out when the watermark crossed) — a late event must be dropped
    val gs = TestGroupState.create[EwmaStream.EwmaState](
      optionalState = Optional.empty[EwmaStream.EwmaState](),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(10 * 86400000L).longValue()),
      hasTimedOut = false)
    val late = EwmaStream.VEv(7L, new java.sql.Timestamp(3600 * 1000L), 1L, 42.0)
    val out = EwmaStream.transition((1L, day0), Iterator(late), gs).toList
    assert(out.isEmpty, s"late arrival re-emitted a closed day: $out")
    assert(!gs.exists, "no state may be recreated for a closed day")
  }
}
