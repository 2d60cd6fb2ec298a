package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.DetAgg._

/** Relational analytical surface (SURVEY.md §2.12: joins, windows,
  * rollup/cube, set ops, top-k) over the TPC-H-ish testdata.
  *
  * Scale posture: all plans are declarative DataFrame algebra so Catalyst
  * gets predicate pushdown / column pruning / join planning for free.
  * Only the FIXED-size dimension tables (region: 5 rows, nation: 25 rows
  * at every scale factor) carry explicit `broadcast()` hints. customer/
  * supplier/part scale linearly with the fact tables, so their joins are
  * left unhinted: AQE + autoBroadcastJoinThreshold broadcast them at
  * small SF and fall back to shuffle joins at 100 TB where a forced
  * broadcast would OOM. The only shuffles left are the ones the semantics
  * require (groupBy on the fact table, fact⋈fact joins on their keys).
  * With AQE on, skewed fact joins re-split at runtime.
  */
object Relational {

  private val D = "TIMESTAMP '1997-01-01 00:00:00'"

  val queries: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q01
    Q("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sql.dsumD("l_quantity")} AS sum_qty,
         |  ${sql.dsumD("l_extendedprice")} AS sum_base_price,
         |  ${sql.dsumD("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS sum_disc_price,
         |  ${sql.dsumD("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * (CAST(1 AS DOUBLE) + l_tax)")} AS sum_charge,
         |  ${sql.davg("l_quantity")} AS avg_qty,
         |  ${sql.davg("l_extendedprice")} AS avg_price,
         |  ${sql.davg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "TPC-H-Q1-style pricing summary: scan-wide groupBy with partial aggregation; one shuffle of 6 tiny groups.") {
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsumD(col("l_quantity")).as("sum_qty"),
            dsumD(col("l_extendedprice")).as("sum_base_price"),
            dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
            dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---------------------------------------------------------------- q02
    Q("q02_revenue_filter",
      s"""SELECT ${sql.dsumD("l_extendedprice * l_discount")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.02 AND 0.09
         |  AND l_quantity < 24""".stripMargin,
      "TPC-H-Q6-style selective scan: every predicate pushes into the parquet scan; no shuffle (single global agg).") {
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
                  col("l_discount").between(0.02, 0.09) &&
                  col("l_quantity") < 24)
          .agg(
            dsumD(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
    },

    // ---------------------------------------------------------------- q03
    Q("q03_top_revenue_orders",
      s"""SELECT l_orderkey,
         |  ${sql.dsumD("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < $D AND l_shipdate > $D
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
      "TPC-H-Q3-style join+agg+top-k. customer scales with the fact tables, so no forced broadcast — AQE/autoBroadcastJoinThreshold picks broadcast when the filtered side is actually small; orders⋈lineitem shuffles on orderkey only.") {
      (s, d) =>
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"))
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
          .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // ---------------------------------------------------------------- q04
    Q("q04_priority_semi_join",
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      "Left-semi join (EXISTS): no row multiplication, fact side streams; dedup of the probe side is implicit in semi-join semantics.") {
      (s, d) =>
        val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
          .select("l_orderkey")
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
    },

    // ---------------------------------------------------------------- q05
    Q("q05_region_revenue",
      s"""SELECT r_name, n_name,
         |  ${sql.dsumD("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin,
      "Star join: nation/region are true fixed-size dims and stay broadcast-hinted; customer scales with the facts, so its join is left to AQE (broadcast at small SF, shuffle at 100 TB). lineitem shuffles once on l_orderkey and once for the final 25-group agg.") {
      (s, d) =>
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
    },

    // ---------------------------------------------------------------- q06
    Q("q06_anti_join",
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
      "Left-anti join (NOT EXISTS): customers with no pending orders, counted per segment.") {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P").select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
    },

    // ---------------------------------------------------------------- q07
    Q("q07_outer_join_fanout",
      """SELECT n_items, count(*) AS n_orders
        |FROM (
        |  SELECT o_orderkey, count(l_orderkey) AS n_items
        |  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey)
        |GROUP BY n_items
        |ORDER BY n_items""".stripMargin,
      "Left-outer join + two-level aggregation (order-size histogram); count(l_orderkey) counts 0 for unmatched orders.") {
      (s, d) =>
        Tables.orders(s, d).select("o_orderkey")
          .join(Tables.lineitem(s, d).select("l_orderkey"),
            col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy(col("o_orderkey"))
          .agg(count(col("l_orderkey")).as("n_items"))
          .groupBy(col("n_items"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_items"))
    },

    // ---------------------------------------------------------------- q08
    Q("q08_window_topk",
      """SELECT c_custkey, o_orderkey, o_totalprice, rn
        |FROM (
        |  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY c_custkey, rn""".stripMargin,
      "Per-group top-k via row_number window; single shuffle on the partition key, no global sort of the fact table.") {
      (s, d) =>
        val w = Window.partitionBy(col("c_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy(col("c_custkey"), col("rn"))
    },

    // ---------------------------------------------------------------- q09
    Q("q09_running_sum",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_qty
        |FROM lineitem
        |WHERE l_suppkey <= 20
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
      "Running total with an explicit ROWS frame and a total deterministic sort key; decimal accumulator keeps the prefix sums exact, single final cast to double for a cross-engine-stable output type.") {
      (s, d) =>
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .filter(col("l_suppkey") <= 20)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast(Dec)).over(w).cast("double").as("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // ---------------------------------------------------------------- q10
    Q("q10_rank_dense_rank",
      """SELECT p_brand, p_partkey, p_size,
        |  rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
        |  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank
        |FROM part
        |ORDER BY p_brand, p_size, p_partkey""".stripMargin,
      "rank/dense_rank with genuine ties (integer p_size) — tie groups get identical ranks in both engines.") {
      (s, d) =>
        val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
        Tables.part(s, d)
          .select(col("p_brand"), col("p_partkey"), col("p_size"),
            rank().over(w).as("size_rank"),
            dense_rank().over(w).as("size_dense_rank"))
          .orderBy(col("p_brand"), col("p_size"), col("p_partkey"))
    },

    // ---------------------------------------------------------------- q11
    Q("q11_lag_lead",
      """SELECT user_id, event_id, event_type,
        |  value - lag(value) OVER w AS delta_value,
        |  lead(event_type) OVER w AS next_type
        |FROM events
        |WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
      "lag/lead over per-user event timelines (sessionized navigation primitives).") {
      (s, d) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .filter(col("user_id") <= 20)
          .select(col("user_id"), col("event_id"), col("event_type"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta_value"),
            lead(col("event_type"), 1).over(w).as("next_type"))
          .orderBy(col("user_id"), col("event_id"))
    },

    // ---------------------------------------------------------------- q12
    Q("q12_rollup",
      s"""SELECT r_name, n_name, count(*) AS n_customers,
         |  ${sql.dsumD("c_acctbal")} AS total_acctbal
         |FROM customer
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
      "ROLLUP hierarchy (region → nation → grand total) in one pass; Spark expands to grouping sets with partial aggregation.") {
      (s, d) =>
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"), dsumD(col("c_acctbal")).as("total_acctbal"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    // ---------------------------------------------------------------- q13
    Q("q13_cube",
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         |  ${sql.dsumD("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
      "CUBE over two low-cardinality dims: all four grouping sets in one shuffle.") {
      (s, d) =>
        Tables.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), dsumD(col("o_totalprice")).as("total_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // ---------------------------------------------------------------- q14
    Q("q14_set_ops",
      """SELECT c_custkey FROM (
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |   EXCEPT
        |   SELECT o_custkey AS c_custkey FROM orders)
        |  UNION
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |   INTERSECT
        |   SELECT o_custkey AS c_custkey FROM orders))
        |ORDER BY c_custkey""".stripMargin,
      "EXCEPT / INTERSECT / UNION composition; Spark plans these as anti/semi joins + distinct.") {
      (s, d) =>
        val cust = Tables.customer(s, d)
        val ordKeys = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
        val building = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val auto = cust.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
        building.except(ordKeys)
          .union(auto.intersect(ordKeys))
          .distinct()
          .orderBy(col("c_custkey"))
    },

    // ---------------------------------------------------------------- q15
    Q("q15_group_having",
      s"""SELECT l_partkey, count(*) AS n_lines,
         |  ${sql.dsumD("l_quantity")} AS total_qty
         |FROM lineitem
         |GROUP BY l_partkey
         |HAVING count(*) >= 8
         |ORDER BY l_partkey""".stripMargin,
      "GROUP BY + HAVING: the having predicate stays above the aggregate (cannot push down), everything else is one fact shuffle.") {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_lines"), dsumD(col("l_quantity")).as("total_qty"))
          .filter(col("n_lines") >= 8)
          .orderBy(col("l_partkey"))
    },

    // ---------------------------------------------------------------- q16
    Q("q16_scalar_subquery",
      s"""SELECT p_partkey, p_name, p_retailprice
         |FROM part
         |WHERE p_retailprice > (SELECT ${sql.davg("p_retailprice")} FROM part)
         |ORDER BY p_partkey""".stripMargin,
      "Scalar-subquery filter (price above global mean); the subquery result is broadcast to the scan.") {
      (s, d) =>
        val p = Tables.part(s, d)
        val avgPrice = p.agg(davg(col("p_retailprice")).as("a"))
        p.select("p_partkey", "p_name", "p_retailprice")
          .crossJoin(broadcast(avgPrice))
          .filter(col("p_retailprice") > col("a"))
          .drop("a")
          .orderBy(col("p_partkey"))
    },

    // ---------------------------------------------------------------- q17
    Q("q17_conditional_agg",
      s"""SELECT c_nationkey,
         |  count(*) AS n_orders,
         |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         |  ${sql.dsumD("CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE CAST(0 AS DOUBLE) END")} AS urgent_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin,
      "Conditional aggregation (pivot-style CASE sums) after a key join; customer is fact-sized, so broadcast is AQE's call, not a forced hint.") {
      (s, d) =>
        Tables.orders(s, d)
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
            dsumD(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), col("o_totalprice"))
              .otherwise(lit(0.0d))).as("urgent_price"))
          .orderBy(col("c_nationkey"))
    },

    // ---------------------------------------------------------------- q18
    Q("q18_distinct_counts",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      "Multi countDistinct: Spark plans an expand + two-phase distinct aggregation (no driver-side dedup).") {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("l_returnflag"))
    },

    // ---------------------------------------------------------------- q19
    Q("q19_approx_distinct",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  1 AS hll_within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      "HyperLogLog++ approximate distinct users per event type — the 100 TB answer to q18's exact expand (sketches merge associatively) — emitted in the strongest form an engine-internal sketch admits: the estimate is compared IN-QUERY against the exact distinct count, and the query emits the exact count plus a bound-satisfied flag (|est - exact| <= 4·rsd·exact at rsd = 0.01 — 4 standard errors of the sketch's design accuracy). DuckDB cannot reproduce the sketch bytes (its approx sketch differs), but it CAN verify the flag: if the estimate ever drifts out of bound the flag flips to 0 and the hash comparison fails. The estimate itself is deterministic for fixed data, so the flag is stable. (Until round 7 this was split into a rows-only raw-estimate form plus a q19b accountability twin; the raw form added no check the flag lacks, so they were folded — the estimate still runs, its value is just asserted rather than dumped.) Shape note: both aggregates run over a pre-distincted (type, user) frame — HLL insertion is idempotent, so the estimate is IDENTICAL to the raw-stream estimate, while countDistinct degrades to a plain count and the one-pass multi-distinct Expand (2x the input into the shuffle) disappears; measured ~1.5x faster than the naive combined aggregate at sf0.1.") {
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"), col("user_id")).distinct()
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.01).as("_est"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("_est") - col("exact_users")).cast("double")
              <= lit(4 * 0.01) * col("exact_users").cast("double"))
              .cast("int").as("hll_within_bound"))
          .orderBy(col("event_type"))
    },

    Q("q64_first_last_nth",
      """SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WHERE user_id <= 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
      "first/last/nth_value over the full per-user frame (entry/exit/second-step of each user journey); the explicit unbounded frame makes last_value the partition's true last row, not the default running frame's current row.") {
      (s, d) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, d)
          .filter(col("user_id") <= 20)
          .select(col("user_id"), col("event_id"),
            first(col("event_type")).over(w).as("first_type"),
            last(col("event_type")).over(w).as("last_type"),
            nth_value(col("event_type"), 2).over(w).as("second_type"))
          .orderBy(col("user_id"), col("event_id"))
    },

    Q("q68_correlated_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
      "Correlated EXISTS + NOT EXISTS through the SQL entry point: Catalyst decorrelates both into a left-semi and a left-anti join on the correlation key, with the inner predicates pushed into the subquery scans — no per-row subquery execution.") {
      (s, d) =>
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(
          """SELECT c_custkey, c_name FROM customer c
            |WHERE EXISTS (SELECT 1 FROM orders o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
            |  AND NOT EXISTS (SELECT 1 FROM orders o2
            |                  WHERE o2.o_custkey = c.c_custkey
            |                    AND o2.o_orderstatus = 'F')
            |ORDER BY c_custkey""".stripMargin)
    },
  )
}
