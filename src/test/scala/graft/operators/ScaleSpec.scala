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

  test("bloom sizing: fp rate holds the design point across build scales") {
    // the fixed-m failure this guards against: 2^16 bits at 1M keys is
    // ~50% fp — the prune silently evaporates exactly where it matters.
    // sizeFor picks 16 bits/key (next pow-2), so the design fp at k=4
    // stays in ~0.03-0.9% across the rounding range at every scale.
    assert(Scale.Bloom.sizeFor(0) == Scale.Bloom.minBits)
    assert(Scale.Bloom.sizeFor(3000) == Scale.Bloom.minBits) // 48k bits < floor
    assert(Scale.Bloom.sizeFor(100000) == (1 << 21))
    assert(Scale.Bloom.sizeFor(1000000) == (1 << 24))
    assert(Scale.Bloom.sizeFor(100000000) == Scale.Bloom.maxBits) // clamped
    Seq(1000L, 100000L, 1000000L).foreach { n =>
      val members = spark.range(n).select(col("id").as("k"))
      val bits = Scale.Bloom.build(members, "k")
      val m = bits.length * 64
      // approx_count_distinct (rsd 5%) can only round UP across a pow-2
      // boundary for these n (16n sits within 5% of a boundary only from
      // below, at n=1M); halving m would need a >30% underestimate (>>4
      // standard errors), and at 8 bits/key the k=4 design fp is ~2.4% —
      // which would contradict the <1% assertion below. So an undersized
      // bloom FAILS here rather than being tolerated as dead slack.
      assert(m == Scale.Bloom.sizeFor(n) || m == Scale.Bloom.sizeFor(n) * 2,
        s"n=$n sized m=$m")
      // completeness at every scale: zero false negatives
      assert(members.filter(!Scale.Bloom.mightContain(bits, col("k"))).count() == 0)
      // soundness: disjoint probe keys pass at under 1%
      val probes = 200000L
      val fp = spark.range(n, n + probes).select(col("id").as("k"))
        .filter(Scale.Bloom.mightContain(bits, col("k"))).count()
      val rate = fp.toDouble / probes
      assert(rate < 0.01, s"n=$n m=$m fp rate $rate")
    }
  }

  test("native runtime bloom takes over the q84 shape beyond the hand-rolled cap") {
    // Scale.Bloom's doc caps the hand-rolled filter at 4 MB (~2M build
    // keys) and says "beyond that use AQE/native bloom joins" — this
    // proves the handoff instead of advising it: with Spark's runtime
    // bloom filter enabled (and its size thresholds scaled down to
    // test-sized data, exactly as the 100 TB defaults already pass at
    // cluster scale), the UNPRUNED q84 join shape gets a
    // BloomFilterMightContain probe injected on the fact side by the
    // optimizer itself. So below the cap the hand-rolled bloom prunes
    // with an 8 KB-4 MB literal; above it the same query text is pruned
    // by the native runtime filter — no operator action needed beyond
    // the runbook conf.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test data is far below the production 10 GB / 10 MB thresholds
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // the filter only helps (and only injects) on shuffle joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Scale.urgentMonthlyRevenue(spark, sf0001, prune = false)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("BloomFilter"),
        s"no runtime bloom injected into the q84 shape:\n${optimized.take(1200)}")
      // both prune mechanisms agree: hand-rolled bloom + native filter
      // vs native filter alone produce identical results
      val hand = Scale.urgentMonthlyRevenue(spark, sf0001, prune = true)
      assert(df.collect().toSeq == hand.collect().toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // closes the loop between the skew DIAGNOSTIC (q92) and the
    // remediations: beyond Scale.saltedJoin, the first thing the 100 TB
    // runbook tells operators to rely on is AQE's own skew-join split —
    // this pins that it actually fires on a 1-key-dominant frame at
    // local[4] with thresholds scaled down to test-sized data.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 99% of fact rows share key 0; dim is uniform
      val fact = spark.range(200000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id") % 1000).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      // aggregate on top so one collect drives the full join; the filter
      // cannot be pushed below the join (references both sides)
      val agg = fact.join(dim, "k")
        .agg(sum(length(col("payload")) + col("v")).as("s"))
      val rows = agg.collect()
      assert(rows.length == 1 && !rows.head.isNullAt(0))
      val plan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.toString.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${plan.toString.take(800)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
