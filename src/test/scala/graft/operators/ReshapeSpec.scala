package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ReshapeSpec extends SparkSpec {

  test("histogram quantile estimates land within one bucket width of exact") {
    val li = Tables.lineitem(spark, sf0001)
    val est = Reshape.histogramQuantiles(li, "l_returnflag",
        col("l_extendedprice"), 256, Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.5, 0.95))").as("p"),
        ((max(col("l_extendedprice")) - min(col("l_extendedprice"))) / 256.0).as("w"))
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Double](1)(0), r.getSeq[Double](1)(1), r.getDouble(2)))).toMap
    exact.foreach { case (flag, (p50, p95, w)) =>
      assert(math.abs(est((flag, 0.5)) - p50) <= w,
        s"$flag p50: est ${est((flag, 0.5))} vs exact $p50 (bucket width $w)")
      assert(math.abs(est((flag, 0.95)) - p95) <= w,
        s"$flag p95: est ${est((flag, 0.95))} vs exact $p95 (bucket width $w)")
    }
  }

  test("histogram quantiles on a constant column degrade to the constant") {
    import spark.implicits._
    val df = Seq(("a", 7.0), ("a", 7.0), ("a", 7.0), ("b", 1.0)).toDF("g", "x")
    val est = Reshape.histogramQuantiles(df, "g", col("x"), 16, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(est("a") == 7.0 && est("b") == 1.0)
  }
}
