package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ScaleSpec extends SparkSpec {

  test("salted join equals the plain join") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("value"))
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("user_bucket", pmod(col("user_id"), lit(7)))
    val plain = ev.join(dim, Seq("user_id"))
    val salted = Scale.saltedJoin(ev, dim, "user_id", saltFactor = 4)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("bloom prefilter: no false negatives, real pruning, tiny fp rate") {
    val urgent = Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bits = Scale.Bloom.build(urgent, "o_orderkey")
    val li = Tables.lineitem(spark, sf001).select(col("l_orderkey"))
    val matching = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"))
    // no false negatives: every fact row with a real match passes the bloom
    assert(matching.filter(!Scale.Bloom.mightContain(bits, col("l_orderkey"))).count() == 0)
    val total = li.count()
    val nMatch = matching.count()
    val kept = li.filter(Scale.Bloom.mightContain(bits, col("l_orderkey"))).count()
    assert(kept >= nMatch)
    // the prune is real: ~1/5 of orders are urgent, so ~4/5 of fact rows
    // must never reach the join shuffle
    assert(kept < total * 3 / 10, s"bloom kept $kept of $total rows")
    // false-positive rate among non-matching rows stays near the design point
    val fpRate = (kept - nMatch).toDouble / (total - nMatch).max(1L)
    assert(fpRate < 0.01, s"fp rate $fpRate")
  }

  test("skew profile: top keys ordered, ratio anchored to the hottest key") {
    val rows = graft.SparkEntry.queries("q92_key_skew_profile")(spark, sf001)
      .collect()
    assert(rows.length == 5)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "top-5 not descending")
    val nRows = rows.head.getLong(5)
    assert(nRows == Tables.orders(spark, sf001).count())
    // rank 1 is the global max, and the ratio is exactly its count over
    // the mean rows-per-key
    val nKeys = rows.head.getLong(4)
    assert(rows.head.getDouble(6) ==
      cnts.head.toDouble * nKeys.toDouble / nRows.toDouble)
    assert(rows.head.getDouble(6) >= 1.0)
    assert(rows.head.getDouble(3) == cnts.head.toDouble / nRows.toDouble)
  }

  test("bucketed tables join without a shuffle on either side") {
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    // clean both catalog entries AND stale warehouse dirs (a crashed run
    // can leave the location behind without the table)
    Seq("bucketed_orders", "bucketed_items").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Scale.writeBucketed(o, "bucketed_orders", "o_orderkey", buckets = 8)
    Scale.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bucketed_items", "o_orderkey", buckets = 8)
    val joined = spark.table("bucketed_orders")
      .join(spark.table("bucketed_items"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => joined.count(); a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty, s"bucketed join shuffled: ${plan.toString.take(400)}")
    // inner join keeps only orders that have lineitems — compare against
    // the equivalent unbucketed join
    val expected = o.join(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "o_orderkey").count()
    assert(joined.count() == expected)
  }
}
