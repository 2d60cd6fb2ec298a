package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-batch ingest orchestration, re-expressing the reference's
  * `process_batch` (/root/reference/code/Main.py:55-170) with the
  * SURVEY.md §4.3 fixes:
  *   1. the validated frame is cached once — the reference re-scans the
  *      source up to ~10× per batch for its counts/collects;
  *   2. lineage row_hash excludes volatile columns so the fact write can
  *      be an idempotent upsert;
  *   3. all driver-side bookkeeping (path sets, counts) comes off the
  *      cached frame, never a re-read.
  *
  * The fact/agg sink is pluggable: parquet for tests and lakehouse-style
  * deployments, JDBC (append or upsert) for the reference's Postgres
  * topology.
  */
object IngestPipeline {

  /** Where good rows and aggregates go. */
  trait Sink {
    def writeFact(df: DataFrame, table: String): Unit
    def writeAgg(df: DataFrame, table: String): Unit
  }

  final case class ParquetSink(baseDir: String) extends Sink {
    def writeFact(df: DataFrame, table: String): Unit =
      df.write.mode(SaveMode.Append).parquet(s"$baseDir/${table.replace('.', '_')}")
    def writeAgg(df: DataFrame, table: String): Unit =
      df.write.mode(SaveMode.Append).parquet(s"$baseDir/${table.replace('.', '_')}")
  }

  final case class JdbcSink(cfg: Sinks.JdbcConfig, upsert: Boolean = true) extends Sink {
    def writeFact(df: DataFrame, table: String): Unit =
      if (upsert) Sinks.jdbcUpsert(df, table, cfg)
      else Sinks.jdbcAppend(df, table, cfg)
    def writeAgg(df: DataFrame, table: String): Unit =
      Sinks.jdbcAppend(df, table, cfg)
  }

  final case class Config(
      validation: Validation.Config,
      sink: Sink,
      auditDir: String,
      quarantineDir: String,
      groupCol: String = "sensor_id",
      dataSource: String = "object_store",
      deterministicStats: Boolean = true)

  final case class BatchResult(
      table: String,
      totalRows: Long,
      goodRows: Long,
      badRows: Long,
      status: String)

  /** Read one format group of files with an optional explicit schema
    * (utils.py:136-165): CSV is header-aware; JSON is line-delimited;
    * missing schema falls back to inference. */
  def readBatchFiles(
      spark: SparkSession,
      paths: Seq[String],
      format: String,
      schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val reader = spark.read
    val withSchema = schema.map(reader.schema).getOrElse(
      reader.option("inferSchema", "true"))
    format.toLowerCase match {
      case "csv"  => withSchema.option("header", "true").csv(paths: _*)
      case "json" => withSchema.json(paths: _*)
      case other  => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** Group a batch's file paths by extension — driver-side, tiny
    * cardinality (replaces the reference's RDD groupBy, Main.py:76-80). */
  def groupByExtension(paths: Seq[String]): Map[String, Seq[String]] =
    paths.groupBy(p => p.split('.').last.toLowerCase)

  /** Run the clean → validate → enrich → persist → aggregate → audit
    * pipeline for one already-read file group. */
  def processGroup(
      spark: SparkSession,
      raw: DataFrame,
      fileLabel: String,
      cfg: Config): BatchResult = {
    val table = Metadata.deriveTableName(fileLabel)
    val cleaned = Cleaning.clean(raw)
    val (good0, bad, annotated) = Validation.split(cleaned, cfg.validation)
    try {
      val total = annotated.count() // single job; good/bad reuse the cache
      val good = Metadata.addLineage(good0, fileLabel)
      val goodCount = good.count()
      val badCount = Sinks.writeQuarantine(
        bad.withColumn(Metadata.FilePathCol, lit(fileLabel))
           .withColumn(Metadata.IngestionTsCol, current_timestamp()),
        cfg.quarantineDir, table)
      if (goodCount > 0) {
        cfg.sink.writeFact(good, s"${table}_transformed")
        StatsAggregation.aggregate(good0, cfg.groupCol, cfg.dataSource,
            s"${table}_agg", cfg.deterministicStats)
          .foreach(cfg.sink.writeAgg(_, s"${table}_agg"))
      }
      val result = BatchResult(table, total, goodCount, badCount, "SUCCESS")
      Audit.write(spark, cfg.auditDir, result, fileLabel)
      result
    } finally annotated.unpersist()
  }
}
