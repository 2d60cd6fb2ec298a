package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Rule-based row validation with first-error-wins semantics,
  * re-expressing /root/reference/code/helpers.py:60-142.
  *
  * The reference applies rules as a per-column `when` cascade where an
  * already-set error_reason is never overwritten — so a row failing
  * several rules reports only the first (rule order = key fields, then
  * numeric parses, then ranges, then heavy-null). That order is
  * observable in quarantine output and is preserved here, including the
  * exact message formats (helpers.py:98,109,121,131) and the truncated
  * `int(n_cols * threshold)` heavy-null cutoff (helpers.py:126) — with
  * its quirk that a threshold of 0 (single-column frame) flags every row.
  *
  * The whole cascade is one Project of nested `when` expressions:
  * codegen-friendly, no shuffle, fully pushed alongside the scan.
  */
object Validation {

  /** One validation rule: a failure predicate plus its reason string. */
  sealed trait Rule {
    def field: String
    def failure(): Column
    def reason: String
  }

  /** Mandatory key column must be non-null ("Missing key: f"). */
  final case class KeyNotNull(field: String) extends Rule {
    def failure(): Column = col(field).isNull
    def reason: String = s"Missing key: $field"
  }

  /** Column must parse as a number ("Invalid numeric in f"). */
  final case class NumericParses(field: String) extends Rule {
    def failure(): Column = col(field).cast("double").isNull || isnan(col(field).cast("double"))
    def reason: String = s"Invalid numeric in $field"
  }

  /** Column must lie in [min, max] ("f out of range [min,max]").
    * Like the reference, compares the ORIGINAL column (implicit cast). */
  final case class InRange(field: String, min: Double, max: Double) extends Rule {
    def failure(): Column = col(field) < min || col(field) > max
    def reason: String = s"$field out of range [${fmt(min)},${fmt(max)}]"
    private def fmt(d: Double): String =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
  }

  final case class Config(
      keyFields: Seq[String] = Nil,
      numericFields: Seq[String] = Nil,
      ranges: Seq[InRange] = Nil,
      heavyNullThreshold: Double = 0.5) {
    /** Rules in the reference's application order. */
    def rules(columns: Seq[String]): Seq[Rule] =
      (keyFields.map(KeyNotNull.apply) ++
        numericFields.map(NumericParses.apply) ++
        ranges).filter(r => columns.contains(r.field))
  }

  val ErrorCol = "error_reason"
  val HeavyNullReason = "Too many nulls in row"

  /** Adds `error_reason` (null = valid) via the first-error-wins cascade.
    * The heavy-null count runs over the INPUT columns only, mirroring
    * helpers.py:130 (engine-added columns don't count). */
  def withErrorReason(df: DataFrame, cfg: Config): DataFrame = {
    val dataCols = df.columns.toSeq
    val ruleCascade = cfg.rules(dataCols).foldLeft(lit(null).cast("string")) {
      (acc, rule) => when(acc.isNotNull, acc).when(rule.failure(), lit(rule.reason)).otherwise(acc)
    }
    val nullCount = dataCols.map(c => col(c).isNull.cast("int")).reduce(_ + _)
    val threshold = (dataCols.length * cfg.heavyNullThreshold).toInt
    val full = when(ruleCascade.isNotNull, ruleCascade)
      .when(nullCount >= threshold, lit(HeavyNullReason))
      .otherwise(lit(null).cast("string"))
    df.withColumn(ErrorCol, full)
  }

  /** Validate and split into (good, bad). Unlike the reference
    * (SURVEY.md §4.3-1), the annotated frame is persisted before the
    * two-filter fan-out so the source is scanned once, not once per
    * downstream action. Call `unpersist()` on the returned handle when
    * the batch is fully consumed. */
  def split(df: DataFrame, cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    val annotated = withErrorReason(df, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val good = annotated.filter(col(ErrorCol).isNull).drop(ErrorCol)
    val bad = annotated.filter(col(ErrorCol).isNotNull)
    (good, bad, annotated)
  }
}
