package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Executes the PRODUCTION Postgres upsert dialect against a REAL
  * PostgreSQL server — the last gap in the reference-parity sink story
  * (utils.py:203-205 writes to Postgres; Derby executes the ANSI
  * dialect, DuckDB accepts the `ON CONFLICT` phrasing, and this spec
  * runs the same statement text on the actual wire target).
  *
  * No Postgres JDBC driver exists in the offline sandbox, so the
  * statement travels through `psql` instead of `DriverManager`: the
  * `?` placeholders are rewritten to `$1..$n` — exactly the positional
  * translation the pgjdbc client performs before PREPARE — and the
  * prepared statement is EXECUTEd per row. What this proves is the
  * DIALECT (identifier quoting incl. `%` columns, ON CONFLICT target,
  * DO NOTHING replay semantics) on a genuine PostgreSQL;
  * JdbcSinksSpec's Derby/DuckDB cases prove the executor-side
  * PreparedStatement plumbing.
  *
  * Fully availability-gated: the server binaries ship in this sandbox
  * but may not elsewhere, and PostgreSQL refuses to run as root, so the
  * server runs as `nobody` via runuser over a chown'd temp dir. Any
  * missing prerequisite CANCELS the test (assume — visible as canceled,
  * never silently passed). */
class PostgresServerSpec extends SparkSpec {

  private val initdb = "/usr/local/bin/initdb"
  private val pgCtl = "/usr/local/bin/pg_ctl"
  private val runuser = "/usr/sbin/runuser"
  private val port = 55931

  private def sh(cmd: String*): (Int, String) = {
    import scala.sys.process._
    val out = new StringBuilder
    val logger = ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n'))
    // cwd /tmp: runuser drops to nobody, which cannot chdir back into
    // the repo directory — harmless but noisy
    val code = Process(cmd, new java.io.File("/tmp")).!(logger)
    (code, out.toString)
  }

  private def psql(sockDir: String, script: String): (Int, String) = {
    val f = Files.createTempFile("graft-psql", ".sql")
    Files.write(f, script.getBytes("UTF-8"))
    try sh("psql", "-h", sockDir, "-p", port.toString, "-U", "nobody",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-f", f.toString)
    finally Files.delete(f)
  }

  private def sample: DataFrame = {
    import spark.implicits._
    // the `pct%` column exercises FIXTURES §1.1 identifier quoting on a
    // real PG parser, not just in the golden text
    Seq((1L, "alpha", 10.5), (2L, "beta", 20.25), (3L, "gamma", 30.0))
      .toDF("id", "name", "pct%")
  }

  private def lit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case other     => String.valueOf(other)
  }

  test("production ON CONFLICT dialect executes on a real PostgreSQL server") {
    assume(Files.isExecutable(Paths.get(initdb)), s"$initdb not present")
    assume(Files.isExecutable(Paths.get(pgCtl)), s"$pgCtl not present")
    assume(Files.isExecutable(Paths.get(runuser)), s"$runuser not present")
    assume(sh("which", "psql")._1 == 0, "psql not on PATH")

    val root: Path = Files.createTempDirectory("graft-pg")
    val data = s"$root/data"; val sock = s"$root/sock"
    Files.createDirectories(Paths.get(data)); Files.createDirectories(Paths.get(sock))
    assume(sh("chown", "-R", "nobody", root.toString)._1 == 0,
      "cannot chown the server dir to nobody (not root?)")
    val (initCode, initOut) =
      sh(runuser, "-u", "nobody", "--", initdb, "-D", data, "-A", "trust")
    assume(initCode == 0, s"initdb failed: ${initOut.takeRight(300)}")

    val (startCode, startOut) = sh(runuser, "-u", "nobody", "--", pgCtl,
      "-D", data, "-l", s"$root/log", "-w",
      "-o", s"-k $sock -p $port -c listen_addresses=''", "start")
    assume(startCode == 0, s"pg_ctl start failed: ${startOut.takeRight(300)}")
    try {
      val df = sample.withColumn(Metadata.RowHashCol,
        Metadata.rowHash(sample.columns.toSeq))
      val cols = df.columns
      // the exact statement jdbcUpsert executes in production, with the
      // pgjdbc positional-parameter translation applied
      val raw = Sinks.upsertSql(df, "public.fact_t", Metadata.RowHashCol,
        Sinks.PostgresOnConflict)
      var i = 0
      val prepared = raw.map { c =>
        if (c == '?') { i += 1; s"$$$i" } else c.toString
      }.mkString
      // the test-side DDL (the sink never creates tables; the reference's
      // schema job does) — PG spellings, e.g. DOUBLE PRECISION not DOUBLE
      def pgType(dt: org.apache.spark.sql.types.DataType): String = dt match {
        case org.apache.spark.sql.types.LongType   => "BIGINT"
        case org.apache.spark.sql.types.DoubleType => "DOUBLE PRECISION"
        case _                                     => "VARCHAR(32672)"
      }
      val colDefs = df.schema.fields.map(f =>
        s"${Sinks.quoteIdent(f.name)} ${pgType(f.dataType)}" +
          (if (f.name == Metadata.RowHashCol) " PRIMARY KEY" else ""))
        .mkString(", ")
      val rows = df.collect()
      def exec(r: org.apache.spark.sql.Row): String =
        s"EXECUTE ups(${cols.indices.map(j => lit(r.get(j))).mkString(", ")});"
      val script =
        s"""CREATE TABLE public.fact_t ($colDefs);
           |PREPARE ups AS $prepared;
           |${rows.map(exec).mkString("\n")}
           |${exec(rows.head)}
           |SELECT count(*) || '|' || count(DISTINCT ${Sinks.quoteIdent(Metadata.RowHashCol)}) FROM public.fact_t;
           |""".stripMargin
      val (code, out) = psql(sock, script)
      assert(code == 0, s"psql failed:\n$out")
      // 3 distinct keys; the replayed first row was a DO NOTHING no-op
      assert(out.linesIterator.contains("3|3"),
        s"expected 3 rows / 3 distinct keys after replay, got:\n$out")

      // a later batch with one new key still lands (delivery, not
      // dedup). PREPARE is session-scoped, so the fresh psql session
      // re-prepares the same production text — the daily-batch shape.
      val (code2, out2) = psql(sock,
        s"""PREPARE ups AS $prepared;
           |EXECUTE ups(4, 'delta', 40.0, 'freshhash');
           |SELECT count(*) FROM public.fact_t;
           |""".stripMargin)
      assert(code2 == 0 && out2.linesIterator.contains("4"),
        s"new-key insert failed:\n$out2")
    } finally {
      sh(runuser, "-u", "nobody", "--", pgCtl, "-D", data, "-m", "fast", "stop")
    }
  }
}
