package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row cleaning, re-expressing /root/reference/code/helpers.py:46-54.
  *
  * Both transforms are single Projects/Filters — they fuse into the scan's
  * whole-stage-codegen pipeline, so at 100 TB they cost one pass and no
  * shuffle.
  */
object Cleaning {

  /** Trim every string column in place (helpers.py:46-50). */
  def trimAllStrings(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) df
    else df.withColumns(stringCols.map(c => c -> trim(col(c))).toMap)
  }

  /** Drop rows where every column is null (`na.drop("all")`, helpers.py:53-54). */
  def dropAllNullRows(df: DataFrame): DataFrame = df.na.drop("all")

  /** The reference's full cleaning stage. */
  def clean(df: DataFrame): DataFrame = dropAllNullRows(trimAllStrings(df))
}
