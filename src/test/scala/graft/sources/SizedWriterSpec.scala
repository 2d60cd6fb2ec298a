package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}

/** Sized parquet output: measured density → file count near target. */
class SizedWriterSpec extends SparkSpec {

  test("writeSized lands files near the byte target") {
    val df = Tables.lineitem(spark, sf001)
    val out = Files.createTempDirectory("graft-sized").toString + "/out"
    val target = 64L << 10 // 64 KiB — small enough to force multiple files
    val report = SizedWriter.writeSized(df, out, targetBytes = target)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == report.files,
      s"expected ${report.files} files, found ${files.length}")
    assert(files.length > 1, "target should have forced a multi-file write")
    // density is measured from a sample, so allow a generous band around
    // the target; catching 10× misses (the plan-stats failure mode) is
    // the point, not ±5%
    val avg = files.map(_.length).sum.toDouble / files.length
    assert(avg > target * 0.3 && avg < target * 2.5,
      s"avg file size $avg vs target $target (files=${files.length})")
    // and nothing was lost or duplicated by the repartition+cap
    assert(spark.read.parquet(out).count() == report.rows)
  }

  test("rebalanced plan carries the AQE rebalance hint") {
    val df = SizedWriter.rebalanced(Tables.lineitem(spark, sf001))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("RebalancePartitions") || plan.contains("rebalance"),
      plan.take(400))
  }
}
