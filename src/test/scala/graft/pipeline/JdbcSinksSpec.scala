package graft.pipeline

import java.nio.file.{Files, Paths}
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** `DriverManager` only hands connections to drivers whose class resolves
  * from the caller's classloader, so a URLClassLoader-loaded engine driver
  * needs this app-classpath shim registered in its place. */
private final class DriverShim(d: java.sql.Driver) extends java.sql.Driver {
  def connect(u: String, p: java.util.Properties): java.sql.Connection = d.connect(u, p)
  def acceptsURL(u: String): Boolean = d.acceptsURL(u)
  def getPropertyInfo(u: String, p: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    d.getPropertyInfo(u, p)
  def getMajorVersion: Int = d.getMajorVersion
  def getMinorVersion: Int = d.getMinorVersion
  def jdbcCompliant: Boolean = d.jdbcCompliant
  def getParentLogger: java.util.logging.Logger = d.getParentLogger
}

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

  test("every jdbcTypeName branch is pinned in the SQL text and executes on Derby") {
    import spark.implicits._
    val df = Seq((1L, 2, 3.toShort, 4.5d, 5.5f, true,
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
        java.sql.Date.valueOf("2024-01-02"), "text", "hash-1"))
      .toDF("c_long", "c_int", "c_short", "c_double", "c_float", "c_bool",
        "c_ts", "c_date", "c_str", Metadata.RowHashCol)
      .withColumn("c_dec", $"c_long".cast("decimal(12,3)"))
    // golden: one CAST per type-mapping branch, derived from the schema
    val sql = Sinks.upsertSql(df, "typed_t", Metadata.RowHashCol, Sinks.AnsiNotExists())
    Seq("CAST(? AS BIGINT)", "CAST(? AS INTEGER)", "CAST(? AS SMALLINT)",
        "CAST(? AS DOUBLE)", "CAST(? AS REAL)", "CAST(? AS BOOLEAN)",
        "CAST(? AS TIMESTAMP)", "CAST(? AS DATE)", "CAST(? AS VARCHAR(32672))",
        "CAST(? AS DECIMAL(12,3))")
      .foreach(c => assert(sql.contains(c), s"missing $c in:\n$sql"))
    // and the text is not just well-formed but EXECUTABLE for every branch
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE typed_t (
          |  "c_long" BIGINT, "c_int" INTEGER, "c_short" SMALLINT,
          |  "c_double" DOUBLE, "c_float" REAL, "c_bool" BOOLEAN,
          |  "c_ts" TIMESTAMP, "c_date" DATE, "c_str" VARCHAR(64),
          |  "row_hash" VARCHAR(64) PRIMARY KEY, "c_dec" DECIMAL(12,3))""".stripMargin)
    } finally conn.close()
    Sinks.jdbcUpsert(df, "typed_t", cfg, dialect = Sinks.AnsiNotExists())
    Sinks.jdbcUpsert(df, "typed_t", cfg, dialect = Sinks.AnsiNotExists()) // replay
    val back = spark.read.jdbc(url, "typed_t", cfg.properties).collect()
    assert(back.length == 1)
    val r = back.head
    assert(r.getAs[Long]("c_long") == 1L && r.getAs[Int]("c_int") == 2 &&
      r.getAs[Boolean]("c_bool") &&
      r.getAs[java.sql.Date]("c_date") == java.sql.Date.valueOf("2024-01-02") &&
      r.getAs[java.math.BigDecimal]("c_dec").doubleValue() == 1.0d)
  }

  test("concurrent AnsiNotExists writers: no lost keys, duplicates bounded — the documented non-atomicity") {
    // The dialect's documented caveat, EXECUTED: INSERT..SELECT..WHERE NOT
    // EXISTS is check-then-insert, and the check locks nothing when the key
    // is absent (the phantom-row problem) — so N concurrent writers of the
    // same batch can each pass NOT EXISTS and insert. This is why the
    // production dialect is PostgresOnConflict (ON CONFLICT DO NOTHING is
    // atomic). The table has NO primary key precisely so the race leaves
    // evidence instead of an exception. Under contention Derby has been
    // observed to do all three of: serialize (lock blocking), duplicate
    // (phantom window), and ABORT a deadlock victim — so each writer wraps
    // in the library's Retry, exactly as a production caller of this
    // dialect must (a rolled-back victim retries cleanly; its transaction
    // committed nothing). Guaranteed properties asserted: (a) no writer
    // fails after retries, (b) no key is LOST, (c) a key appears at most
    // once per writer. Total rows anywhere in [20, 80] are legitimate.
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE race_t ("id" BIGINT, "row_hash" VARCHAR(64))""") // no PK!
    } finally conn.close()
    import spark.implicits._
    val batch = (1L to 20L).map(i => (i, s"key-$i")).toDF("id", Metadata.RowHashCol)
      .coalesce(1).cache()
    batch.count()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try Retry(delay = scala.concurrent.duration.DurationInt(200).millis) {
          Sinks.jdbcUpsert(batch, "race_t", cfg, dialect = Sinks.AnsiNotExists())
        } catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"writer threw: ${Option(errs.peek()).map(_.toString)}")
    val perKey = spark.read.jdbc(url, "race_t", cfg.properties)
      .groupBy(Metadata.RowHashCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKey.size == 20, s"lost keys: ${20 - perKey.size}")
    assert(perKey.values.forall(c => c >= 1 && c <= 4),
      s"per-key count outside [1,4]: ${perKey.filter(kv => kv._2 < 1 || kv._2 > 4)}")
    batch.unpersist()
  }

  test("Postgres ON CONFLICT dialect executes end-to-end (DuckDB, availability-gated)") {
    // The production dialect's SQL was only ever text-pinned (no Postgres
    // in the sandbox). DuckDB's JDBC driver sits in the pre-warmed local
    // artifact cache and accepts the exact Postgres
    // `ON CONFLICT (col) DO NOTHING` phrasing, so the statement jdbcUpsert
    // emits for production is EXECUTED here — within-batch dedup, replay
    // idempotence, later-batch delivery — through the same
    // foreachPartition/PreparedStatement path the Derby tests run. Gated:
    // if the jar is absent the test cancels rather than fails (the build
    // never depends on it — the driver is reflectively loaded, nothing is
    // added to libraryDependencies).
    val jars = {
      import scala.jdk.CollectionConverters._
      val root = Paths.get("/root/.cache/coursier")
      if (!Files.isDirectory(root)) Seq.empty
      else {
        val s = Files.find(root, 24,
          (p, a) => a.isRegularFile &&
            p.getFileName.toString.matches("duckdb_jdbc-.*\\.jar"))
        try s.iterator().asScala.toList finally s.close()
      }
    }
    assume(jars.nonEmpty, "duckdb_jdbc not present in the local artifact cache")
    val loader = new java.net.URLClassLoader(
      Array(jars.head.toUri.toURL), getClass.getClassLoader)
    val drv = Class.forName("org.duckdb.DuckDBDriver", true, loader)
      .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
    DriverManager.registerDriver(new DriverShim(drv))
    val dir = Files.createTempDirectory("graft-duck").toString
    val duckUrl = s"jdbc:duckdb:$dir/pg_upsert.db"
    val duckCfg = Sinks.JdbcConfig(duckUrl, "app", "app",
      driverClass = "org.duckdb.DuckDBDriver")
    // ONE pinned connection for the test's whole duration: the DuckDB
    // JDBC driver caches the database instance per path only while some
    // connection holds it — with per-probe open/close, the instance
    // unloads between steps and a fresh open can race an executor-side
    // close mid-checkpoint (this test flaked twice under full-suite
    // load: once 3 != 4, once a transient 0-row read right after a
    // committed upsert). The pin keeps every executor connection
    // attached to the same live instance, which is also how a real
    // deployment holds a DuckDB sink (one process, one instance).
    val pin = DriverManager.getConnection(duckUrl, duckCfg.connectionProperties)
    try {
      pin.createStatement().execute(
        """CREATE TABLE pg_t ("id" BIGINT, "name" VARCHAR, "score" DOUBLE,
          |  "row_hash" VARCHAR PRIMARY KEY)""".stripMargin)
      // single partition: DuckDB holds a per-process file lock, so the
      // executor-side writers must not race separate database instances
      // one count probe per step: a single end-state assert cannot say
      // WHICH upsert lost a row
      def countRows(): Long = {
        val rs = pin.createStatement().executeQuery("SELECT count(*) FROM pg_t")
        rs.next(); rs.getLong(1)
      }
      val df = withHash(sample).coalesce(1)
      val dup = df.union(df).coalesce(1) // duplicate keys INSIDE one batch
      Sinks.jdbcUpsert(dup, "pg_t", duckCfg) // production default dialect
      assert(countRows() == 3, "in-batch dedup: 6 rows with 3 distinct keys")
      Sinks.jdbcUpsert(df, "pg_t", duckCfg)  // replay: must be a no-op
      assert(countRows() == 3, "replaying the same batch must add no rows")
      import spark.implicits._
      val more = withHash(Seq((4L, "delta", 40.0)).toDF("id", "name", "score"))
        .coalesce(1)
      Sinks.jdbcUpsert(more, "pg_t", duckCfg) // new key still lands
      val rs = pin.createStatement().executeQuery(
        """SELECT count(*), count(DISTINCT "row_hash") FROM pg_t""")
      rs.next()
      assert(rs.getLong(1) == 4, "the new key must land after the replays")
      assert(rs.getLong(2) == 4)
    } finally pin.close()
  }

  test("Postgres production dialect emits ON CONFLICT DO NOTHING (golden SQL)") {
    // pins the statement text so a refactor cannot silently change the
    // production semantics (the DuckDB test above executes the same text)
    val df = withHash(sample)
    val cols = df.columns
    val expected =
      s"""INSERT INTO fact_t (${cols.map(Sinks.quoteIdent).mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT ("row_hash") DO NOTHING""".stripMargin
    assert(Sinks.upsertSql(df, "fact_t", Metadata.RowHashCol,
      Sinks.PostgresOnConflict) == expected)
  }

  test("placeholder counts match the binding loop for BOTH dialects") {
    // jdbcUpsert's setObject loop binds cols.length params, plus one extra
    // key param iff the dialect is not PostgresOnConflict. The PG branch
    // executes only when the cache-gated DuckDB test above can run, so
    // this unconditionally pins the contract a live run would catch
    // breaking: statement arity vs the shared binding code.
    val df = withHash(sample)
    def qCount(s: String) = s.count(_ == '?')
    assert(qCount(Sinks.upsertSql(df, "t", Metadata.RowHashCol,
      Sinks.PostgresOnConflict)) == df.columns.length,
      "PG statement arity must equal the base binding loop (no extra key param)")
    assert(qCount(Sinks.upsertSql(df, "t", Metadata.RowHashCol,
      Sinks.AnsiNotExists())) == df.columns.length + 1,
      "ANSI statement arity must equal base bindings + the NOT EXISTS key param")
  }
}
