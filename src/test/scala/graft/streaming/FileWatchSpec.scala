package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{IngestPipeline, Validation}

/** End-to-end file-watch ingest: drop the reference fixture into a watched
  * dir, drain with AvailableNow, and check sinks + file moves + replay
  * idempotence of the streaming checkpoint. */
class FileWatchSpec extends SparkSpec {

  private def setup(): (FileWatch.Config, String) = {
    val root = Files.createTempDirectory("graft-watch").toString
    Seq("data", "schema", "processed", "qfiles", "sink", "audit", "quarantine")
      .foreach(d => Files.createDirectories(Paths.get(root, d)))
    Files.copy(
      Paths.get("/root/reference/dataset/Smart_Farming_Crop_Yield_2024.csv"),
      Paths.get(root, "data", "Smart_Farming_Crop_Yield_2024.csv"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(
      Paths.get("/root/reference/schema/Smart_Farming_Crop_Yield_2024.json"),
      Paths.get(root, "schema", "Smart_Farming_Crop_Yield_2024.json"),
      StandardCopyOption.REPLACE_EXISTING)
    val cfg = FileWatch.Config(
      dataDir = s"$root/data",
      schemaDir = s"$root/schema",
      processedDir = s"$root/processed",
      quarantineFileDir = s"$root/qfiles",
      pipeline = IngestPipeline.Config(
        validation = Validation.Config(
          keyFields = Seq("sensor_id", "timestamp", "temperature_C"),
          numericFields = Seq("temperature_C"),
          ranges = Seq(Validation.InRange("temperature_C", -50, 50))),
        sink = IngestPipeline.ParquetSink(s"$root/sink"),
        auditDir = s"$root/audit",
        quarantineDir = s"$root/quarantine"),
      checkpointDir = s"$root/checkpoint")
    (cfg, root)
  }

  test("file arrival → ingest → sinks written → source moved to processed/") {
    val (cfg, root) = setup()
    val q = FileWatch.start(spark, cfg, availableNow = true)
    q.awaitTermination()
    val fact = spark.read.parquet(
      s"$root/sink/public_Smart_Farming_Crop_Yield_2024_transformed")
    assert(fact.count() == 500)
    val audit = spark.read.json(s"$root/audit")
    assert(audit.filter(col("status") === "SUCCESS").count() == 1)
    assert(Files.exists(Paths.get(root, "processed", "Smart_Farming_Crop_Yield_2024.csv")))
    assert(!Files.exists(Paths.get(root, "data", "Smart_Farming_Crop_Yield_2024.csv")))

    // replay: restart on the same checkpoint with no new files — the
    // checkpointed source log must not re-deliver (no duplicate audit)
    val q2 = FileWatch.start(spark, cfg, availableNow = true)
    q2.awaitTermination()
    assert(spark.read.json(s"$root/audit").count() == 1)
  }

  test("bootstrap materializes the full directory layout, idempotently") {
    val root = Files.createTempDirectory("graft-boot").toString + "/nested"
    val cfg = FileWatch.Config(
      dataDir = s"$root/data",
      schemaDir = s"$root/schema",
      processedDir = s"$root/processed",
      quarantineFileDir = s"$root/qfiles",
      pipeline = IngestPipeline.Config(
        validation = Validation.Config(Nil, Nil, Nil),
        sink = IngestPipeline.ParquetSink(s"$root/sink"),
        auditDir = s"$root/audit",
        quarantineDir = s"$root/quarantine"),
      checkpointDir = s"$root/checkpoint")
    FileWatch.bootstrap(spark, cfg)
    FileWatch.bootstrap(spark, cfg) // second call must be a no-op, not a crash
    Seq("data", "schema", "processed", "qfiles", "audit", "quarantine", "checkpoint")
      .foreach(d => assert(Files.isDirectory(Paths.get(root, d)), s"missing $d"))
  }

  test("supervisor restarts a failed stream and the retry recovers the data") {
    val (cfg, root) = setup()
    val failFirst = new java.util.concurrent.atomic.AtomicBoolean(true)
    val restarts = new java.util.concurrent.atomic.AtomicInteger(0)
    // first attempt: a stream whose batch throws (simulated sink outage) →
    // awaitTermination rethrows; second attempt: the real pipeline drains
    // the SAME checkpoint and must still see the file (failed batches are
    // not committed to the source log)
    def attempt() =
      if (failFirst.getAndSet(false))
        FileWatch.fileArrivals(spark, cfg).writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", cfg.checkpointDir)
          .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
            throw new RuntimeException("simulated sink outage")
          }.start()
      else FileWatch.start(spark, cfg, availableNow = true)
    FileWatch.supervise(attempt _, maxRestarts = 2,
      initialDelay = scala.concurrent.duration.DurationInt(50).millis,
      onRestart = (_, _) => { restarts.incrementAndGet(); () })
    assert(restarts.get() == 1, s"expected exactly one restart, got ${restarts.get()}")
    assert(spark.read.parquet(
      s"$root/sink/public_Smart_Farming_Crop_Yield_2024_transformed").count() == 500)
  }

  test("supervisor gives up after maxRestarts and propagates the failure") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val (cfg, _) = setup()
    def alwaysFail() = {
      attempts.incrementAndGet()
      FileWatch.fileArrivals(spark, cfg).writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cfg.checkpointDir)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("permanent failure")
        }.start()
    }
    val e = intercept[Exception] {
      FileWatch.supervise(alwaysFail _, maxRestarts = 2,
        initialDelay = scala.concurrent.duration.DurationInt(20).millis)
    }
    assert(attempts.get() == 3, s"expected 3 attempts (1 + 2 restarts), got ${attempts.get()}")
    assert(e.getMessage.contains("permanent failure") ||
      e.getCause != null && e.getCause.getMessage.contains("permanent failure"))
  }
}
