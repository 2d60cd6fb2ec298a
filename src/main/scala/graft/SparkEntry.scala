package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + TESTDATA.md.
  *
  * Each operator module contributes a `Seq[Q]` (Spark implementation +
  * optional DuckDB oracle twin); this object is a thin facade that flattens
  * them into the driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  /** Every registered operation, in presentation order. */
  def all: Seq[Q] =
    operators.Relational.queries ++
    operators.EventWindows.queries ++
    operators.Temporal.queries ++
    operators.Reshape.queries ++
    operators.Collections.queries ++
    operators.Scale.queries ++
    operators.Strings.queries ++
    operators.Sampling.queries ++
    operators.PipelineOps.queries ++
    operators.TextAnalysis.queries ++
    operators.Dedup.queries ++
    operators.Similarity.queries ++
    operators.Multimodal.queries ++
    operators.Forget.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A star join + aggregate touching 5 tables — exercises broadcast dim
    * joins, fact shuffle, and deterministic decimal aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
