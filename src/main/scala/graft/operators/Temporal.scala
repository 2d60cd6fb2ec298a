package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Temporal join family over `events`: range (theta) join, as-of join,
  * plus the SQL entry point and grouping-sets coverage (SURVEY.md §2.12).
  *
  * Scale posture: the range join is equi-keyed on user_id with the time
  * predicate as a secondary filter — Spark executes it as a hash join on
  * user_id with the BETWEEN as a post-join filter, so the worst case is
  * per-user timeline size, not |events|². The as-of join avoids a join
  * entirely: it's a running `last(...)` window over the user timeline —
  * one shuffle, linear work, the idiomatic Spark replacement for
  * point-in-time lookups.
  */
object Temporal {

  /** One SQL text, both engines (q45). The final
    * `CAST(CAST(... AS VARCHAR(64)) AS DOUBLE)` forces each engine to render
    * the exact DECIMAL(38,6) sum to text and re-parse it as DOUBLE, so the
    * output column is a DOUBLE with identical value on Spark and DuckDB —
    * the round-2/round-3 decimal-vs-double hash-mismatch class cannot recur.
    */
  private val q45Text: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR(64)) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Seq[Q] = Seq(

    Q("q42_range_join",
      """SELECT a.event_id AS event_id, count(*) AS n_following
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |WHERE a.event_type = 'error'
        |GROUP BY a.event_id
        |ORDER BY event_id""".stripMargin,
      "Range (theta) join: events within 10 minutes after each error, same user. Equi-key on user_id bounds the blow-up to per-user timelines.") {
      (s, d) =>
        val ev = Tables.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
            col("event_id").as("a_event_id"))
        ev.join(errors,
            col("user_id") === col("a_user") &&
            col("ts") > col("a_ts") &&
            col("ts") <= col("a_ts") + expr("INTERVAL 10 MINUTE"))
          .groupBy(col("a_event_id").as("event_id"))
          .agg(count(lit(1)).as("n_following"))
          .orderBy(col("event_id"))
    },

    Q("q43_asof_join",
      """SELECT event_id, user_id, ts, last_purchase_ts,
        |  CASE WHEN last_purchase_ts IS NOT NULL
        |       THEN CAST(epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(last_purchase_ts) AS BIGINT)
        |       END AS us_since_purchase
        |FROM (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
        |  FROM events)
        |WHERE user_id <= 10
        |ORDER BY user_id, event_id""".stripMargin,
      "As-of join (point-in-time lookup): most recent prior purchase per event via a running window — no join, one shuffle on user_id, linear work.") {
      (s, d) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("last_purchase_ts",
            max(when(col("event_type") === "purchase", col("ts"))).over(w))
          .filter(col("user_id") <= 10)
          .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"),
            when(col("last_purchase_ts").isNotNull,
              unix_micros(col("ts")) - unix_micros(col("last_purchase_ts")))
              .as("us_since_purchase"))
          .orderBy(col("user_id"), col("event_id"))
    },

    Q("q44_grouping_sets",
      """SELECT r_name, c_mktsegment, count(*) AS n_customers
        |FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
        |ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
      "Explicit GROUPING SETS through the SQL entry point (distinct from rollup/cube: an arbitrary set list).") {
      (s, d) =>
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.nation(s, d).createOrReplaceTempView("nation")
        Tables.region(s, d).createOrReplaceTempView("region")
        s.sql(
          """SELECT r_name, c_mktsegment, count(*) AS n_customers
            |FROM customer
            |  JOIN nation ON c_nationkey = n_nationkey
            |  JOIN region ON n_regionkey = r_regionkey
            |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
            |ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
    },

    Q("q45_sql_entry", q45Text,
      "The spark.sql(...) entry point itself: the SAME ANSI text (one shared string constant) runs on both engines (views registered over the parquet tables). The decimal sum is canonicalized to DOUBLE via an identical string round-trip on both sides so the typed hash compares bit-equal.") {
      (s, d) =>
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(q45Text)
    },
  )
}
