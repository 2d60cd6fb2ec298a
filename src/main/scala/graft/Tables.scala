package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Every table is a single parquet file per scale factor. At 100 TB the
  * same call works unchanged against a partitioned directory — Spark's
  * parquet source handles directory listing, partition pruning and
  * vectorized reads; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events"   => events(spark, sfDir)
    case "orders"   => orders(spark, sfDir)
    case "lineitem" => lineitem(spark, sfDir)
    case _          => spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  /** o_orderdate / l_shipdate carry the same regeneration hazard as
    * events.ts (the round-7 incident): normalize through the same
    * three-encoding logic so a driver-side flip to NANOS or NTZ cannot
    * silently break the TPC-H family next round. */
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTs(readWithNanosAsLong(s, s"$d/orders.parquet"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTs(readWithNanosAsLong(s, s"$d/lineitem.parquet"), "l_shipdate")

  private def readWithNanosAsLong(s: SparkSession, path: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path)
  }

  /** Normalize one timestamp-bearing column to instant-semantics
    * TIMESTAMP across the three physical encodings the testdata has
    * shipped (see [[events]] for the per-encoding rationale). */
  private def normalizeTs(raw: DataFrame, c: String): DataFrame =
    raw.schema(c).dataType match {
      case LongType =>
        raw.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType =>
        raw.withColumn(c, col(c).cast(TimestampType))
      case _ => raw
    }
  /** `events.ts` has shipped in three physical encodings across testdata
    * generations; normalize all of them to an instant-semantics TIMESTAMP
    * so every downstream `unix_micros`/window/interval call site sees one
    * type:
    *  - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it —
    *    read nanos as long, truncate to micros (matches TIMESTAMP_NS→
    *    TIMESTAMP casts elsewhere);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ — cast to TIMESTAMP under the UTC session zone
    *    (same instants DuckDB's naive-as-UTC `epoch_us` assigns);
    *  - TIMESTAMP(MICROS, adjusted): already the target type. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(readWithNanosAsLong(s, s"$d/events.parquet"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** Input-skew guard (optimization guide §2.5, "one huge unsplittable
    * file → repartition immediately after the read"): the testdata
    * ships ONE parquet row group per table, so a scan plans one
    * non-empty split and every per-row computation fused into it (md5
    * sketch derivations, hash splits) runs on a single core while the
    * rest idle. When the scan planned fewer partitions than the session
    * has cores, redistribute the (already projected, NARROW) rows; at
    * production scale splits ≥ cores and this is a NO-OP — the
    * condition, not a constant, is the contract. Call sites are chosen
    * by same-session A/B, never blanket: measured ~25 % win on q82's
    * 4×md5 sketch over two narrow columns, and a 32 % LOSS when blanket
    * -applied to the text family's full-text rows (the repartition then
    * shuffles the heavy payload the downstream explode would have kept
    * in place — OPTIMIZATION_r17.md §3). Results are partitioning-
    * independent at every call site (keyed aggregates over exact
    * integers). */
  def fanNarrow(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // plan-side split count (r18, VERDICT r17 #4): the old
    // `df.rdd.getNumPartitions` forced a full physical-plan → RDD DAG
    // conversion (codegen included) per invocation just to read a
    // partition count. The file-scan leaves' split counts are the same
    // number for these scan+project frames, computed from the file
    // listing alone; a non-file leaf (never the case at the current call
    // sites) falls back to the RDD conversion rather than guessing.
    val scanParts = df.queryExecution.sparkPlan.collectLeaves().map {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDD.getNumPartitions
      case _ => df.rdd.getNumPartitions
    }.sum
    if (scanParts >= sc.defaultParallelism) df
    else df.repartition(sc.defaultParallelism)
  }
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
