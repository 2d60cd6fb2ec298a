package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

import graft.pipeline.{IngestPipeline, Validation}

/** Runnable example of the full ingest surface: watches a directory,
  * drains it with AvailableNow, prints the audit trail and sink counts.
  * Drops the reference's clean fixture first, then its corrupted copy as
  * a second arrival, to show incremental micro-batches on one checkpoint.
  *
  * Usage: sbt "runMain graft.streaming.IngestDemo"
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft-ingest-demo").toString
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
    FileWatch.bootstrap(spark, cfg)
    Files.copy(
      Paths.get("/root/reference/schema/Smart_Farming_Crop_Yield_2024.json"),
      Paths.get(root, "schema", "Smart_Farming_Crop_Yield_2024.json"),
      StandardCopyOption.REPLACE_EXISTING)

    def drop(src: String, as: String): Unit = Files.copy(
      Paths.get(src), Paths.get(root, "data", as), StandardCopyOption.REPLACE_EXISTING)
    def drain(): Unit = { val q = FileWatch.start(spark, cfg, availableNow = true); q.awaitTermination() }
    def show(label: String): Unit = {
      println(s"[ingest-demo] --- $label")
      spark.read.json(s"$root/audit").orderBy("file_name").show(10, truncate = false)
      println(s"[ingest-demo] processed/: " +
        Files.list(Paths.get(root, "processed")).count())
      println(s"[ingest-demo] sink rows (approx, 5s budget): " +
        graft.pipeline.Counts.approxCount(
          spark.read.parquet(s"$root/sink/public_Smart_Farming_Crop_Yield_2024_transformed")))
    }

    drop("/root/reference/dataset/Smart_Farming_Crop_Yield_2024.csv",
      "Smart_Farming_Crop_Yield_2024.csv")
    drain(); show("after clean file arrival")
    // second arrival on the same checkpoint: the corrupted copy, read with
    // its own (absent) schema -> inference fallback
    drop("/root/reference/dataset/Smart_Farming_Crop_Yield_2024 - Copy.csv",
      "Smart_Farming_Crop_Yield_2024 - Copy.csv")
    drain(); show("after corrupted copy arrival")
    spark.stop()
  }
}
