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

  // --- the r17 fast path (UnscaledMicros 22-bit split sums) pinned
  //     bit-equal to the decimal-cast sum it replaced -----------------

  test("fast dsum == wide decimal sum, bit-exact, over adversarial doubles") {
    // adversarial mix: tie-adjacent fractions, negatives, denormal-ish
    // tails, the documented ~1e9 magnitude bound, exact halves at the
    // 6th decimal (the HALF_UP boundary), and nulls
    val rnd = new scala.util.Random(42)
    val xs: Seq[java.lang.Double] = (1 to 20000).map { i =>
      val v: Double = i % 7 match {
        case 0 => (rnd.nextDouble() - 0.5) * 2e9
        case 1 => rnd.nextInt(1000000).toDouble / 1000.0 + 0.0000005
        case 2 => -math.exp(rnd.nextDouble() * 20) / 1e3
        case 3 => rnd.nextDouble() * 1e-9
        case 4 => math.sin(i) * 1e6
        case 5 => rnd.nextInt(2000000).toDouble * 0.0000005 // exact half-micros
        case _ => rnd.nextDouble()
      }
      if (i % 97 == 0) null else java.lang.Double.valueOf(v)
    }
    val df = xs.toDF("x").repartition(11)
    val row = df.agg(dsum($"x"), dsumWide($"x")).head
    assert(row.getDecimal(0) == row.getDecimal(1),
      s"fast ${row.getDecimal(0)} != wide ${row.getDecimal(1)}")
  }

  test("fast dsum == wide decimal sum on integral inputs (exact long path)") {
    val vs: Seq[Long] = Seq(0L, 1L, -1L, 999999L, -999999L,
      1000000007L, -987654321L, 9200000000000L, -9200000000000L) ++
      (1 to 5000).map(i => (math.sin(i) * 4e12).toLong)
    val df = vs.toDF("x").repartition(7)
    val row = df.agg(dsum($"x"), dsumWide($"x")).head
    assert(row.getDecimal(0) == row.getDecimal(1))
  }

  test("fast dsum: empty and all-null groups yield null (sum semantics)") {
    val e = Seq.empty[java.lang.Double].toDF("x").agg(dsum($"x")).head
    assert(e.isNullAt(0))
    val n = Seq[java.lang.Double](null, null).toDF("x").agg(dsum($"x")).head
    assert(n.isNullAt(0))
  }

  test("fast dsum throws loudly beyond the unscaled-long element range") {
    // |v| > 9.2e12: longValueExact must refuse, never truncate
    intercept[org.apache.spark.SparkException] {
      Seq(1.0e13d).toDF("x").agg(dsum($"x")).head
    }
  }

  test("UnscaledMicros matches the decimal cast's unscaled value exactly") {
    val rnd = new scala.util.Random(7)
    val vs = (1 to 50000).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(13)))
    vs.foreach { d =>
      val fast = graft.expressions.UnscaledMicros.toMicros(d)
      val cast = new java.math.BigDecimal(java.lang.Double.toString(d))
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
      assert(fast == cast, s"$d: $fast != $cast")
    }
  }
}
