package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DetAgg

/** Per-group statistics over every numeric column, re-expressing
  * /root/reference/code/helpers.py:148-204 (`apply_aggregations`).
  *
  * Output schema matches the reference: `min_<c>/max_<c>/avg_<c>/stddev_<c>`
  * per numeric column plus `data_source`, `file_name`, `ingestion_ts`;
  * rows with a missing group column fall into a literal "unknown" group
  * (helpers.py:167-170 adds the column only when absent; we additionally
  * coalesce nulls the same way the reference's groupBy would surface them).
  *
  * `deterministic = true` swaps avg/stddev for the [[DetAgg]] decimal
  * forms — same math, but reproducible under any partitioning (and
  * oracle-comparable). Either way this is one hash-aggregate with
  * map-side partial aggregation: the shuffle carries |groups| × 4×|cols|
  * values, independent of input size.
  */
object StatsAggregation {

  private val NumericTypes: Set[DataType] =
    Set(DoubleType, IntegerType, FloatType, LongType)

  /** Numeric columns by the reference's own type test (helpers.py:173). */
  def numericCols(df: DataFrame): Seq[String] =
    df.schema.fields.filter(f => NumericTypes.contains(f.dataType)).map(_.name).toSeq

  def statsExprs(cols: Seq[String], deterministic: Boolean): Seq[Column] =
    cols.flatMap { c =>
      Seq(
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"),
        (if (deterministic) DetAgg.davg(col(c)) else avg(col(c))).as(s"avg_$c"),
        (if (deterministic) DetAgg.dstddev(col(c)) else stddev(col(c))).as(s"stddev_$c"))
    }

  def aggregate(
      df: DataFrame,
      groupCol: String = "sensor_id",
      dataSource: String = "minio_bucket",
      fileName: String = "",
      deterministic: Boolean = true): Option[DataFrame] = {
    val withGroup =
      if (df.columns.contains(groupCol)) df
      else df.withColumn(groupCol, lit("unknown"))
    val numerics = numericCols(df)
    if (numerics.isEmpty) None
    else {
      val exprs = statsExprs(numerics, deterministic)
      Some(withGroup
        .groupBy(col(groupCol))
        .agg(exprs.head, exprs.tail: _*)
        .withColumn("data_source", lit(dataSource))
        .withColumn("file_name", lit(fileName))
        .withColumn("ingestion_ts", current_timestamp()))
    }
  }
}
