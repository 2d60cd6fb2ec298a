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
}
