package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Parquet row-group pruning works off per-column min/max stats, so a
  * layout sorted by ONE key skips nothing for filters on any other key:
  * every row group's min/max on the second column spans the whole
  * domain. Interleaving the bits of two keys and range-partitioning +
  * sorting by the interleaved value gives every row group a bounded
  * rectangle in BOTH dimensions — filters on either column (or both)
  * prune row groups. This is the standard lakehouse clustering trick,
  * built here from codegen'd bit arithmetic only (5 shift/mask steps per
  * column — no UDF, no custom expression needed).
  *
  * Scope: two uint32-ranged dimensions (ids, bucketed timestamps, hash
  * buckets). Values are taken mod 2^32; negative values need a monotone
  * shift into the unsigned range first (`v - min`), else they sort after
  * the positive ones and the locality argument breaks.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` to the even bit positions of a long
    * (the classic Morton magic-mask ladder). */
  private def spread(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two 32-bit dimensions: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The Morton code made SORTABLE: bit 63 carries b's bit 31, so for
    * b >= 2^31 the raw code is a negative long and a signed sort would
    * put the top half of the curve first. Flipping the sign bit maps
    * unsigned order onto signed order (the standard trick), keeping the
    * curve contiguous for the full uint32 range of both dimensions. */
  def zsortKey(a: Column, b: Column): Column =
    zvalue(a, b).bitwiseXOR(lit(Long.MinValue))

  /** Write `df` clustered by z(a, b): range-partition on the z-value
    * (each output file owns a z-range), sort within partitions (each row
    * group owns a sub-range), drop the helper column. `blockBytes`
    * controls parquet row-group size — the skipping granularity. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      a: String,
      b: String,
      numFiles: Int = 8,
      blockBytes: Long = 128L << 20): Unit =
    df.withColumn("_z", zsortKey(col(a), col(b)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", blockBytes)
      .parquet(path)
}
