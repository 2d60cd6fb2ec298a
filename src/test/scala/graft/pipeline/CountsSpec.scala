package graft.pipeline

import graft.{SparkSpec, Tables}

class CountsSpec extends SparkSpec {
  test("approxCount converges to the exact count with a generous budget") {
    val df = Tables.lineitem(spark, sf0001)
    val exact = Counts.exactCount(df)
    val approx = Counts.approxCount(df, timeoutMs = 30000L)
    assert(approx == exact, s"approx=$approx exact=$exact")
  }
}
