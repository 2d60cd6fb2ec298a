package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev loop —
    // re-verify one query without replaying the whole suite). The filter
    // applies to BOTH the result dump and oracle_sql.json so the outDir
    // is a self-consistent artifact (an unfiltered oracle file would make
    // the checker report every other query as missing); a filter that
    // matches nothing is a hard error, not a silent no-op run.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark) // SQL fns + levenshtein banded rewrite
    // Publish the corpus size BEFORE any oracle SQL is rendered: the
    // auto-nlist oracle builders embed autoNlist(this count) as the
    // k-means seed literal, so the oracle proves the REGISTERED
    // (auto-scaled) form at every SF, not just where auto floors to 8
    // (metadata-only parquet count — one tiny job). MUST precede the
    // FIRST touch of SparkEntry: the operator modules hold their Q seqs
    // in vals, so oracle strings freeze at object init — the filter
    // validation below is deliberately after this line.
    OracleCtx.setEmbeddingsCount(
      spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in filter: ${unknown.mkString(", ")}")
    }
    new java.io.File(outDir).mkdirs()
    // Remove any verify_errors.json a PRIOR run left: the checker treats a
    // recorded failure as authoritative, so a crashed rerun that fixed a
    // query but died before rewriting this file would otherwise FAIL the
    // fixed query on stale evidence. A missing file is the crash signal.
    Files.deleteIfExists(Paths.get(s"$outDir/verify_errors.json"))
    // Per-query failures are caught so one bad query cannot sink the whole
    // dump — but a caught failure must stay VISIBLE: the driver enumerates
    // the outputs that exist, so a swallowed error surfaces as the query's
    // silent ABSENCE from the correctness artifact (exactly how the round-7
    // TIMESTAMP_NTZ regression hid four queries). Record every failure in
    // verify_errors.json next to the dump and end with a loud summary.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures(name) = String.valueOf(e.getMessage)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // delete any output a PREVIOUS run left for this query: the dev
        // loop re-verifies into an existing outDir, and an analysis-time
        // failure happens before overwrite-mode deletes anything — the
        // stale-but-correct parquet would otherwise make the checker (and
        // the driver) PASS a broken query on old data (review catch, r8)
        val dir = Paths.get(s"$outDir/$name")
        if (Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          // Close the walk stream, and never let a deletion IOException
          // escape this catch — it would abort every remaining query and
          // skip the verify_errors.json/oracle_sql.json writes entirely.
          try {
            val walk = Files.walk(dir)
            try walk.iterator().asScala.toSeq.reverse
              .foreach(p => Files.deleteIfExists(p))
            finally walk.close()
          } catch { case io: Throwable =>
            failures(name) += s" [stale-output cleanup failed: ${io.getMessage}]"
          }
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} QUERIES FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
