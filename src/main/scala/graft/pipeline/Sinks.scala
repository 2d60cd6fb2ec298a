package graft.pipeline

import java.sql.DriverManager
import java.util.Properties

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence surface, re-expressing the reference's sinks
  * (SURVEY.md §2.2): JDBC fact/agg appends, date-partitioned JSON audit
  * and quarantine stores, and the processed/quarantine file mover.
  *
  * The JDBC path adds what the reference lacks (SURVEY.md §3.3/§4.3-3):
  * an idempotent upsert keyed on `row_hash`, so a replayed micro-batch
  * cannot double-write. Plain appends stay available for parity.
  */
object Sinks {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      batchSize: Int = 5000) {
    def properties: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p.setProperty("driver", "org.postgresql.Driver")
      p.setProperty("rewriteBatchedStatements", "true")
      p.setProperty("batchsize", batchSize.toString)
      p
    }
  }

  /** Reference-parity JDBC append (utils.py:203-205). */
  def jdbcAppend(df: DataFrame, table: String, cfg: JdbcConfig): Unit =
    Retry() {
      df.write.mode(SaveMode.Append).jdbc(cfg.url, table, cfg.properties)
    }

  /** Idempotent upsert: `INSERT ... ON CONFLICT (conflictCol) DO NOTHING`
    * executed per partition — replays become no-ops instead of duplicate
    * rows (or PK violations, as the reference's DDL would produce).
    * Executors connect directly (no driver funnel), batched like the
    * reference's writer. */
  def jdbcUpsert(df: DataFrame, table: String, cfg: JdbcConfig,
      conflictCol: String = Metadata.RowHashCol): Unit = {
    val cols = df.columns
    val insertSql =
      s"""INSERT INTO $table (${cols.map(quoteIdent).mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${quoteIdent(conflictCol)}) DO NOTHING""".stripMargin
    val url = cfg.url; val props = cfg.properties; val batch = cfg.batchSize
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(insertSql)
          var n = 0
          rows.foreach { r =>
            cols.indices.foreach(i => st.setObject(i + 1, r.get(i)))
            st.addBatch(); n += 1
            if (n % batch == 0) st.executeBatch()
          }
          st.executeBatch(); conn.commit()
        } finally conn.close()
      }
    }
  }

  /** SQL identifier quoting — column names may contain `%` etc.
    * (FIXTURES.md §1.1). */
  def quoteIdent(name: String): String = "\"" + name.replace("\"", "\"\"") + "\""

  /** Date-partitioned JSON audit append (utils.py:195-196): one file per
    * batch under `audit_date=YYYY-MM-DD/`. */
  def writeAudit(df: DataFrame, auditDir: String): Unit =
    Retry() {
      df.withColumn("audit_date", date_format(current_timestamp(), "yyyy-MM-dd"))
        .coalesce(1)
        .write.mode(SaveMode.Append)
        .partitionBy("audit_date")
        .json(auditDir)
    }

  /** Quarantine store: bad rows + quarantine_date partition
    * (helpers.py:229-244). */
  def writeQuarantine(bad: DataFrame, quarantineDir: String, tableName: String): Long = {
    if (bad.isEmpty) 0L
    else {
      val stamped = bad.withColumn("quarantine_date",
        date_format(current_timestamp(), "yyyy-MM-dd"))
      val n = stamped.count()
      Retry() {
        stamped.write.mode(SaveMode.Append)
          .partitionBy("quarantine_date")
          .json(s"$quarantineDir/$tableName")
      }
      n
    }
  }

  /** Move a source file to processed/ or quarantine/ (utils.py:48-78) via
    * Hadoop FS — works for file:// and s3a:// alike. A missing source
    * returns false immediately (already moved / vanished) instead of
    * burning the retry budget. */
  def moveFile(spark: SparkSession, src: String, destDir: String): Boolean = {
    val srcPath = new Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(srcPath)) false
    else Retry() {
      val dest = new Path(destDir, srcPath.getName)
      fs.mkdirs(new Path(destDir))
      fs.rename(srcPath, dest)
    }
  }
}
