package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Z-order clustering: Morton-code correctness against a bit-twiddling
  * reference, and the actual row-group skipping it exists to buy. */
class ZOrderSpec extends SparkSpec {

  // reference Morton code, one bit at a time
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zvalue matches the bitwise reference") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => mortonRef(a, b) }
    assert(got == want, s"got $got, want $want")
  }

  test("zsortKey orders the full uint32 range as unsigned Morton order") {
    import spark.implicits._
    // b spanning the sign boundary of spread(b)<<1 (b >= 2^31 flips bit 63)
    val cases = Seq((5L, 1L), (7L, (1L << 31) - 1), (1L, 1L << 31),
      (2L, 0xFFFFFFFFL), (9L, (1L << 31) + 3))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zsortKey(col("a"), col("b")).as("sk"))
      .orderBy(col("sk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = cases.sortBy { case (a, b) =>
      mortonRef(a, b) ^ Long.MinValue // unsigned order via sign-bit flip
    }
    assert(got == want, s"got $got, want $want")
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def ops(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: ops(a.executedPlan)
      case q: QueryStageExec => p +: ops(q.plan)
      case _ => p +: p.children.flatMap(ops)
    }
    ops(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups for filters on the second dimension") {
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val root = Files.createTempDirectory("graft-zorder").toString
    // small row groups so the fixture has many pruning units
    ZOrder.writeZOrdered(li, s"$root/z", "l_orderkey", "l_partkey",
      numFiles = 4, blockBytes = 64L << 10)
    li.repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.option("parquet.block.size", 64L << 10).parquet(s"$root/linear")

    val maxKey = 50 // selective filter on the SECOND z dimension
    def filtered(path: String) =
      spark.read.parquet(path).filter(col("l_partkey") < maxKey)
    val zRows = scanRows(filtered(s"$root/z"))
    val linRows = scanRows(filtered(s"$root/linear"))
    // same answer either way
    assert(filtered(s"$root/z").count() == filtered(s"$root/linear").count())
    // the linear layout's row groups all span the full partkey domain ->
    // no pruning; the z-layout must skip a real share of them
    assert(zRows < linRows,
      s"z-order read $zRows rows vs linear $linRows — no skipping happened")
    assert(zRows.toDouble / linRows < 0.8,
      s"z-order read $zRows/$linRows rows — skipping too weak to matter")
  }
}
