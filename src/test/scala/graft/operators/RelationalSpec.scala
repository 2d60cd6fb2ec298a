package graft.operators

import graft.{SparkSpec, SparkEntry}

class RelationalSpec extends SparkSpec {

  test("every registered query runs on sf0.001 and yields a stable schema") {
    SparkEntry.all.foreach { q =>
      val df = q.run(spark, sf0001)
      assert(df.columns.nonEmpty, s"${q.name}: no columns")
      assert(df.columns.distinct.length == df.columns.length,
        s"${q.name}: duplicate output columns")
      val n = df.count()
      assert(n >= 0, s"${q.name}: count failed")
    }
  }

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q01 returns the 6 returnflag/linestatus groups") {
    assert(SparkEntry.queries("q01_pricing_summary")(spark, sf0001).count() == 6)
  }

  test("q05 covers all 25 nations") {
    assert(SparkEntry.queries("q05_region_revenue")(spark, sf0001).count() == 25)
  }

  test("q08 emits at most 3 rows per customer, ranked 1..3") {
    val rows = SparkEntry.queries("q08_window_topk")(spark, sf0001)
      .groupBy("c_custkey").count().collect()
    assert(rows.forall(_.getLong(1) <= 3))
  }

  test("entry() flagship is non-empty") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
