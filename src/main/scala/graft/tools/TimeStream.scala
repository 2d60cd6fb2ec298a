// scratch streaming-throughput probe:
//   sbt "runMain graft.tools.TimeStream funnel /root/testdata/sf0.1 20"
//   sbt "runMain graft.tools.TimeStream funnel /root/testdata/sf0.1 20 rocksdb"
// Drives a stateful machine over the events table as a REAL multi-micro-
// batch stream (N equal file slices, maxFilesPerTrigger=1, AvailableNow)
// and reports events/sec — the streaming counterpart of TimeQ, so the
// round records carry a measured number for the state machines, not just
// plan arguments. The far-future marker finalizes all state at the end.
package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object TimeStream {
  def main(args: Array[String]): Unit = {
    val machine = if (args.length > 0) args(0) else "funnel"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // `rocksdb` is position-independent, so only parse args(2) as the
    // batch count when it IS a number — "TimeStream funnel <dir> rocksdb"
    // must select the store, not crash on toInt
    val batches = args.drop(2).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(20)
    val rocksdb = args.contains("rocksdb")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (rocksdb)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val events = graft.Tables.events(spark, sfDir)
    val n = events.count()
    val dir = Files.createTempDirectory("graft-timestream").toString
    events.repartition(batches).write.mode("overwrite").parquet(dir)
    events.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("error"))
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = events.schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)

    val out = machine match {
      case "funnel"    => graft.streaming.FunnelStream.funnelStages(src, "40 days").toDF()
      case "retention" => graft.streaming.RetentionStream.retentionStages(src, "40 days").toDF()
      case "bigram"    => graft.streaming.BigramStream.bigrams(src, "40 days").toDF()
      case "ewma"      => graft.streaming.EwmaStream.ewmaStages(src, "40 days").toDF()
      case "sessions"  => graft.streaming.SessionStream.sessions(src, "40 days")
      case other => sys.error(s"unknown machine: $other")
    }
    val t0 = System.nanoTime()
    val q = out.writeStream.format("noop")
      .option("checkpointLocation", Files.createTempDirectory("graft-ts-ck").toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val dt = (System.nanoTime() - t0) / 1e9
    val store = if (rocksdb) "rocksdb" else "memory"
    println(f"[timestream] $machine/$store: $n events, $batches+1 batches, " +
      f"$dt%.2f s = ${n / dt}%.0f events/s")
    spark.stop()
  }
}
