package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.DetAgg.sql

/** Scale utilities that only pay off beyond local mode but must be part
  * of the library's surface: skew-salted joins and bucketed co-located
  * joins (SURVEY.md §7.4 "100 TB posture").
  */
object Scale {

  /** Join a skew-prone fact to a dimension on `key`, salting the fact
    * side so one hot key spreads over `saltFactor` reducers. The dim side
    * is replicated ×saltFactor (dim must be small-ish — if it were big,
    * you'd use AQE skew-join instead). Result equals the plain join.
    *
    * The salt is derived from a hash of the whole fact row (values-based,
    * deterministic under retries — no rand(), which would break task
    * replay at scale). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so the subsequent join is
    * co-located (no shuffle on either side). Requires a saveAsTable
    * catalog write — the lakehouse deployment shape. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 16): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** The semantic contract of the skew technique, oracle-verified: a
    * salted join must produce EXACTLY the rows of the plain join it
    * replaces. (The bucketed-join twin is covered by ScaleSpec's plan
    * assertions instead — bucketing requires a catalog write, which an
    * oracle query must not perform.) */
  val queries: Seq[Q] = Seq(

    Q("q58_salted_join_parity",
      s"""SELECT c_nationkey, count(*) AS n_orders,
         |  ${sql.dsumD("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_nationkey
         |ORDER BY c_nationkey""".stripMargin,
      "Skew-salted fact⋈dim join (hot keys spread over 8 reducer salts, dim replicated x8) aggregated per nation — the oracle is the PLAIN join, proving the salt is semantics-neutral.") {
      (s, d) =>
        val fact = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_custkey").as("custkey"))
        val dim = Tables.customer(s, d)
          .select(col("c_custkey").as("custkey"), col("c_nationkey"))
        saltedJoin(fact, dim, "custkey")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            graft.functions.DetAgg.dsumD(col("o_totalprice")).as("total_price"))
          .orderBy(col("c_nationkey"))
    },

    Q("q67_topk_per_key",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "Custom whole-operator top-k per key (graft.plans.TopKPerKey: LogicalPlan + Strategy + heap-based SparkPlan): map-side partial heaps cut shuffle volume to <= k rows per key per task and the final phase never sorts — the oracle is the row_number window formulation it replaces, proving exact equivalence under a total order.") {
      (s, d) =>
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        graft.plans.TopKPerKey(li,
            keys = Seq("l_orderkey"),
            order = Seq("l_extendedprice" -> false, "l_linenumber" -> true),
            k = 3)
          .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
  )
}
