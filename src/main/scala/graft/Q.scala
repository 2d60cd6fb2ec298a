package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operation: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an exact DuckDB oracle twin.
  *
  * Conventions that make the oracle compare deterministic:
  *  - every output column is explicitly aliased, identically in both sides;
  *  - every query ends in a total deterministic ORDER BY (cheap at verify
  *    scale, and harmless at bench scale relative to the work above it);
  *  - floating-point aggregates go through [[graft.functions.DetAgg]] so
  *    results are independent of partitioning / combine order.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def apply(name: String, oracle: String, doc: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle), doc)

  // Q.noOracle was removed in round 7 with the q19/q52 fold: every
  // registered query now carries an exact oracle, and keeping the
  // rows-only constructor around would let a future registration
  // silently regress that invariant. Genuinely un-oracle-able semantics
  // belong in-query as a bound check (the q19/q52 pattern) instead.
}
