package graft.pipeline

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Executes the JDBC sink path end-to-end against embedded Derby (on
  * Spark's classpath) — the reference's primary output is a JDBC database
  * (utils.py:203-205), so this path must not ship run-never. Covers:
  * Spark-writer append round-trip, executor-side upsert idempotence
  * (double-invoke → no duplicate rows), and the Postgres production SQL
  * text as a golden (ON CONFLICT is not executable without Postgres). */
class JdbcSinksSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftTest;create=true"
  private val cfg = Sinks.JdbcConfig(url, "app", "app",
    driverClass = "org.apache.derby.jdbc.EmbeddedDriver")

  private def sample: DataFrame = {
    import spark.implicits._
    Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
      .toDF("id", "name", "score")
  }

  private def withHash(df: DataFrame): DataFrame =
    df.withColumn(Metadata.RowHashCol, Metadata.rowHash(df.columns.toSeq))

  test("jdbcAppend round-trips through a real JDBC database") {
    Sinks.jdbcAppend(sample, "append_t", cfg)
    val back = spark.read.jdbc(url, "append_t", cfg.properties)
    assert(back.count() == 3)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0)))
  }

  test("jdbcUpsert is idempotent: replaying the same batch adds no rows") {
    val df = withHash(sample)
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE upsert_t (
          |  "id" BIGINT, "name" VARCHAR(64), "score" DOUBLE,
          |  "row_hash" VARCHAR(64) PRIMARY KEY)""".stripMargin)
    } finally conn.close()

    Sinks.jdbcUpsert(df, "upsert_t", cfg, dialect = Sinks.AnsiNotExists())
    Sinks.jdbcUpsert(df, "upsert_t", cfg, dialect = Sinks.AnsiNotExists()) // replay
    val back = spark.read.jdbc(url, "upsert_t", cfg.properties)
    assert(back.count() == 3, "replayed upsert must not duplicate rows")

    // a new row still lands on the third invoke (not just a no-op sink)
    import spark.implicits._
    val more = withHash(Seq((4L, "delta", 40.0)).toDF("id", "name", "score"))
    Sinks.jdbcUpsert(more, "upsert_t", cfg, dialect = Sinks.AnsiNotExists())
    assert(spark.read.jdbc(url, "upsert_t", cfg.properties).count() == 4)
  }

  test("upsert dedups WITHIN one batch too (same key twice in the input)") {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE upsert_dup (
          |  "id" BIGINT, "row_hash" VARCHAR(64) PRIMARY KEY)""".stripMargin)
    } finally conn.close()
    import spark.implicits._
    val dup = Seq((1L, "k1"), (1L, "k1"), (2L, "k2"))
      .toDF("id", Metadata.RowHashCol).coalesce(1)
    Sinks.jdbcUpsert(dup, "upsert_dup", cfg, dialect = Sinks.AnsiNotExists())
    assert(spark.read.jdbc(url, "upsert_dup", cfg.properties).count() == 2)
  }

  test("Postgres production dialect emits ON CONFLICT DO NOTHING (golden SQL)") {
    // not executable without Postgres; pin the statement text instead so a
    // refactor cannot silently change the production semantics
    val df = withHash(sample)
    val cols = df.columns
    val expected =
      s"""INSERT INTO fact_t (${cols.map(Sinks.quoteIdent).mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT ("row_hash") DO NOTHING""".stripMargin
    assert(Sinks.upsertSql(df, "fact_t", Metadata.RowHashCol,
      Sinks.PostgresOnConflict) == expected)
  }
}
