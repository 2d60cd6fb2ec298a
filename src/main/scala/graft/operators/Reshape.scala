package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.DetAgg._

/** Reshaping operators: pivot, distribution windows (ntile/percent_rank),
  * union-by-name with schema drift. */
object Reshape {

  val queries: Seq[Q] = Seq(

    Q("q46_pivot",
      s"""SELECT user_id,
         |  ${sql.dsumD("CASE WHEN event_type = 'click' THEN value END")} AS click,
         |  ${sql.dsumD("CASE WHEN event_type = 'error' THEN value END")} AS error,
         |  ${sql.dsumD("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
         |  ${sql.dsumD("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
         |  ${sql.dsumD("CASE WHEN event_type = 'view' THEN value END")} AS view
         |FROM events WHERE user_id <= 30
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
      "Pivot (long→wide): per-user value totals by event type. Explicit pivot values avoid the extra distinct-values job at scale.") {
      (s, d) =>
        Tables.events(s, d)
          .filter(col("user_id") <= 30)
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(dsumD(col("value")))
          .orderBy(col("user_id"))
    },

    Q("q47_ntile_percent_rank",
      """SELECT o_orderkey, o_totalprice,
        |  ntile(4) OVER w AS price_quartile,
        |  round(percent_rank() OVER w, 6) AS price_pct_rank
        |FROM orders
        |WHERE o_custkey <= 50
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
      "Distribution windows: quartile bucketing + percent rank over a deterministic total order.") {
      (s, d) =>
        val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .filter(col("o_custkey") <= 50)
          .select(col("o_orderkey"), col("o_totalprice"),
            ntile(4).over(w).as("price_quartile"),
            round(percent_rank().over(w), 6).as("price_pct_rank"))
          .orderBy(col("o_orderkey"))
    },

    Q("q50_median_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      "Exact interpolated percentiles (Spark percentile == DuckDB quantile_cont, linear interpolation); the approx_percentile sketch is the 100 TB swap-in. Both price percentiles come from ONE array-percentile buffer — separate aggs would each collect the full column per group.") {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
            expr("percentile(l_extendedprice, array(0.25, 0.95))").as("_p"))
          .select(col("l_returnflag"), col("median_qty"),
            round(col("_p").getItem(0), 6).as("p25_price"),
            round(col("_p").getItem(1), 6).as("p95_price"))
          .orderBy(col("l_returnflag"))
    },

    Q.noOracle("q52_approx_percentile",
      "approx_percentile (KLL-style sketch) per returnflag — the mergeable, one-pass replacement for q50's exact percentiles at 100 TB (no oracle: sketch internals differ across engines). The quantile array is emitted as a joined string: the driver's rows-only probe sorts output values in pandas, and raw array columns crash that sort.") {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(array_join(
            expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.95), 1000)")
              .cast("array<string>"), ",").as("approx_price_quantiles"))
          .orderBy(col("l_returnflag"))
    },

    Q("q51_corr_covar",
      s"""SELECT event_type, count(*) AS n,
         |  round((${sql.dsumD("value * (CAST(epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 AS DOUBLE) / 86400000000.0)")}
         |    - ${sql.dsumD("value")} * ${sql.dsumD("CAST(epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000 AS DOUBLE) / 86400000000.0")} / count(*))
         |    / (count(*) - 1), 6) AS covar_value_tod
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      "Sample covariance of value vs time-of-day (as day-fraction), built from exact decimal sums — order-independent, unlike covar_samp on doubles. Day-fraction keeps magnitudes inside DetAgg's exact-cast range.") {
      (s, d) =>
        val tod = (unix_micros(col("ts")) % 86400000000L).cast("double") / lit(86400000000.0d)
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round((dsumD(col("value") * tod)
              - dsumD(col("value")) * dsumD(tod) / count(lit(1)))
              / (count(lit(1)) - 1), 6).as("covar_value_tod"))
          .orderBy(col("event_type"))
    },

    Q("q48_union_by_name",
      """SELECT entity_id, kind, label, count(*) AS n
        |FROM (
        |  SELECT c_custkey AS entity_id, 'customer' AS kind, c_mktsegment AS label
        |  FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS entity_id, 'supplier' AS kind, NULL AS label
        |  FROM supplier)
        |GROUP BY entity_id, kind, label
        |ORDER BY kind, entity_id""".stripMargin,
      "unionByName with schema drift (allowMissingColumns fills the supplier side's missing label with null).") {
      (s, d) =>
        val c = Tables.customer(s, d)
          .select(col("c_custkey").as("entity_id"), lit("customer").as("kind"),
            col("c_mktsegment").as("label"))
        val sup = Tables.supplier(s, d)
          .select(col("s_suppkey").as("entity_id"), lit("supplier").as("kind"))
        c.unionByName(sup, allowMissingColumns = true)
          .groupBy(col("entity_id"), col("kind"), col("label"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("kind"), col("entity_id"))
    },
  )
}
