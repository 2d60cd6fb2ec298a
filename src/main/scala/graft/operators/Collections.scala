package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Collection-valued and multiset operators: bag semantics
  * (intersectAll/exceptAll), generator queries (explode → word count),
  * argmin/argmax aggregation, and ordered array aggregation. */
object Collections {

  val queries: Seq[Q] = Seq(

    Q("q53_multiset_ops",
      """SELECT c_nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 0
        |  INTERSECT ALL
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
      "Bag-semantics INTERSECT ALL (duplicates preserved up to min multiplicity) — distinct from q14's set semantics.") {
      (s, d) =>
        val c = Tables.customer(s, d)
        c.filter(col("c_acctbal") > 0).select("c_nationkey")
          .intersectAll(c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("c_nationkey"))
    },

    Q("q54_word_count",
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |      FROM documents)
        |GROUP BY word
        |HAVING count(*) >= 100
        |ORDER BY n DESC, word""".stripMargin,
      "The canonical generator query: explode tokens → corpus word frequencies (threshold keeps output bounded at any corpus size).") {
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 100)
          .orderBy(col("n").desc, col("word"))
    },

    Q("q55_argmin_argmax",
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
        |  max(o_totalprice) AS max_price
        |FROM ranked
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      "argmin/argmax aggregation (Spark max_by/min_by ≡ DuckDB arg_max/arg_min), single-pass, no window needed for 'row of the extreme'. The ordering key is (price, orderkey), not price alone: on a price tie both engines then agree on the orderkey, where the bare form returns an arbitrary tied row.") {
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("biggest_order"),
            expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("smallest_order"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy(col("o_orderpriority"))
    },

    Q("q56_sorted_array_agg",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
      "Ordered array aggregation: collect_list is order-nondeterministic, so the sort AFTER collection is what makes the result stable. Emitted as a joined string rather than a raw array — the driver's pandas-based comparator cannot sort/hash array cells.") {
      (s, d) =>
        Tables.nation(s, d)
          .groupBy(col("n_regionkey"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy(col("n_regionkey"))
    },

    Q("q57_except_all",
      """SELECT c_nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 0
        |  EXCEPT ALL
        |  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
      "Bag-semantics EXCEPT ALL (each left duplicate survives unless matched by a right duplicate) — completes the multiset algebra next to q53's INTERSECT ALL.") {
      (s, d) =>
        val c = Tables.customer(s, d)
        c.filter(col("c_acctbal") > 0).select("c_nationkey")
          .exceptAll(c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("c_nationkey"))
    },
  )
}
