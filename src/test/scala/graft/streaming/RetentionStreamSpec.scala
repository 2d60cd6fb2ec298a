package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

/** Batch-equivalence for the streaming retention cohorts: same transition
  * code in batch mode against q73's two-aggregate formulation, then a real
  * multi-micro-batch stream that must finalize to the identical set. */
class RetentionStreamSpec extends SparkSpec {

  /** q73's per-user (cohort, week) pairs, computed independently. */
  private def expected(ev: DataFrame): Set[(Long, java.sql.Timestamp, Int)] = {
    val firstw = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    active.join(firstw, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
        ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort"))) / 604800)
          .cast("int").as("week_n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2))).toSet
  }

  test("JVM week truncation equals date_trunc('week') under UTC") {
    val got = Tables.events(spark, sf0001).limit(500)
      .select(col("ts"), date_trunc("week", col("ts")).as("wk"))
      .collect()
    got.foreach { r =>
      val eventUs = r.getTimestamp(0).getTime * 1000 +
        r.getTimestamp(0).getNanos / 1000 % 1000
      assert(RetentionStream.weekStartUs(eventUs) == r.getTimestamp(1).getTime * 1000L,
        s"week mismatch for ${r.getTimestamp(0)}")
    }
  }

  test("batch run of the retention machine equals q73's two-aggregate shape") {
    val ev = Tables.events(spark, sf0001)
    val got = RetentionStream.retentionStages(ev)
      .collect().map(w => (w.user_id, w.cohort_week, w.week_n)).toSet
    val want = expected(ev)
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing")
    // aggregated counts reproduce the q73 result exactly
    val counts = RetentionStream.cohortCounts(RetentionStream.retentionStages(ev))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
    val wantCounts = want.groupBy(w => (w._2, w._3)).map { case (k, v) => k -> v.size.toLong }
    assert(counts == wantCounts)
  }

  test("streaming retention finalizes to the batch result across micro-batches") {
    val dir = Files.createTempDirectory("graft-retention").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    batch.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = RetentionStream.retentionStages(src, "40 days")
      .writeStream.format("memory").queryName("retention_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("retention_out")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2))).toSet
    val want = expected(batch)
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing " +
        s"of ${want.size} expected (user, week) records")
    assert(spark.table("retention_out").filter(col("user_id") >= 0).count() == want.size,
      "append emission must be exactly-once per (user, week)")
  }
}
