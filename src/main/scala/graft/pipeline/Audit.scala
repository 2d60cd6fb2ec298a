package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Audit-trail records (one row per processed file group per batch),
  * re-expressing /root/reference/code/utils.py:171-197.
  *
  * A typed Dataset — the one stable record type in the pipeline
  * (SURVEY.md §7.1), so it gets a case class + Encoder instead of a
  * dynamic DataFrame. The audit store doubles as the idempotence ledger
  * (SURVEY.md §7.4): on micro-batch replay, a (batch, file) pair already
  * present means side effects were completed.
  */
final case class AuditRecord(
    table_name: String,
    file_name: String,
    total_rows: Long,
    good_rows: Long,
    bad_rows: Long,
    status: String)

object Audit {
  def write(
      spark: SparkSession,
      auditDir: String,
      result: IngestPipeline.BatchResult,
      fileName: String): Unit = {
    import spark.implicits._
    val df = Seq(AuditRecord(
      result.table, fileName, result.totalRows,
      result.goodRows, result.badRows, result.status)).toDF()
    Sinks.writeAudit(df, auditDir)
  }
}
