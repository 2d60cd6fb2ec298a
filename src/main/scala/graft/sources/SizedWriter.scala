package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sizing: write parquet in files near a target size.
  *
  * At 100 TB the failure modes are both directions: thousands of KB-sized
  * files per partition (every downstream scan pays per-file open + listing
  * cost, and the driver pays memory per file status) or multi-GB files
  * (one task per file on read → no parallelism, and stragglers on write).
  * The fix is to pick the file count from MEASURED on-disk density, not
  * guessed in-memory size: parquet's encoded+compressed bytes/row is
  * routinely 5-20× smaller than Catalyst's in-memory estimate, so sizing
  * from plan stats lands far off target.
  *
  * Two passes over the input (one bounded sample write + one count) buy
  * the measurement — the standard price of a compaction job; the data
  * itself is still written exactly once.
  */
object SizedWriter {

  final case class Report(
      rows: Long,
      bytesPerRow: Double,
      files: Int,
      rowsPerFile: Long)

  /** Parquet bytes/row measured from a bounded RANDOM sample written to
    * a temp dir (real encoding + compression, then deleted). The sample
    * is `df.sample`, not `limit`: a first-rows prefix of sorted or
    * clustered data (one source's short documents first) would
    * misestimate density by large factors — the exact failure mode this
    * module exists to avoid. Small samples slightly OVER-estimate
    * bytes/row — footer/dictionary overhead is amortized less — which
    * errs toward smaller files, the cheap direction. */
  def measureRowBytes(df: DataFrame, totalRows: Long, sampleRows: Int = 10000): Double = {
    val spark = df.sparkSession
    val tmp = new Path(
      spark.sparkContext.hadoopConfiguration.get("hadoop.tmp.dir", "/tmp"),
      s"graft-sizer-${java.util.UUID.randomUUID()}")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      require(totalRows > 0, "cannot size output of an empty frame")
      val fraction = math.min(1.0, sampleRows * 1.2 / totalRows)
      // coalesce(1): one file, so the fixed per-file overhead is counted once
      val sample = df.sample(withReplacement = false, fraction, seed = 42L)
        .coalesce(1).cache()
      val n = sample.count()
      require(n > 0, "sample came back empty — raise sampleRows")
      sample.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      sample.unpersist()
      val bytes = fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
      bytes.toDouble / n
    } finally fs.delete(tmp, true)
  }

  /** Write `df` as parquet aiming at `targetBytes` per file: round-robin
    * repartition to the computed file count (even rows per task), with
    * `maxRecordsPerFile` as the hard cap against underestimation. */
  def writeSized(
      df: DataFrame,
      path: String,
      targetBytes: Long = 128L << 20,
      sampleRows: Int = 10000): Report = {
    val rows = df.count()
    val bytesPerRow = measureRowBytes(df, rows, sampleRows)
    val rowsPerFile = math.max(1L, (targetBytes / bytesPerRow).toLong)
    val files = math.max(1, math.ceil(rows.toDouble / rowsPerFile).toInt)
    df.repartition(files)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
    Report(rows, bytesPerRow, files, rowsPerFile)
  }

  /** Zero-extra-pass alternative for inside a pipeline: let AQE rebalance
    * output partitions toward `spark.sql.adaptive.advisoryPartitionSizeInBytes`
    * (splitting skewed partitions, coalescing tiny ones). Sizes by
    * in-memory bytes, so on-disk files land at advisory/compression-ratio —
    * set the advisory accordingly, or use [[writeSized]] when the exact
    * on-disk target matters more than the extra passes. */
  def rebalanced(df: DataFrame): DataFrame = df.hint("rebalance")
}
