package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.DetAgg._

class DetAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val xs = (1 to 10000).map(i => math.sin(i) * 1e6)

  test("dsum is identical across partitionings (order-independence)") {
    val sums = Seq(1, 3, 7, 32).map { p =>
      xs.toDF("x").repartition(p).agg(dsum($"x")).head.getDecimal(0)
    }
    assert(sums.distinct.size == 1)
  }

  test("dsum/davg agree with double aggregation within float tolerance") {
    val df = xs.toDF("x")
    val exact = df.agg(dsumD($"x"), davg($"x")).head
    val ref = df.agg(sum($"x"), avg($"x")).head
    assert(math.abs(exact.getDouble(0) - ref.getDouble(0)) < 1e-3)
    assert(math.abs(exact.getDouble(1) - ref.getDouble(1)) < 1e-6)
  }

  test("dstddev matches stddev_samp within tolerance") {
    val df = xs.toDF("x")
    val got = df.agg(dstddev($"x")).head.getDouble(0)
    val ref = df.agg(stddev_samp($"x")).head.getDouble(0)
    assert(math.abs(got - ref) / ref < 1e-9)
  }

  test("dstddev of a single value is null, of constant column is 0") {
    assert(Seq(5.0).toDF("x").agg(dstddev($"x")).head.isNullAt(0))
    val c = Seq.fill(100)(3.14).toDF("x").agg(dstddev($"x")).head.getDouble(0)
    assert(math.abs(c) < 1e-12)
  }
}
