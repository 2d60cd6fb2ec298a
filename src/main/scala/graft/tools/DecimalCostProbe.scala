package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DetAgg._

/** Measure the determinism tax on the TPC-H family: q01's aggregate with
  * DetAgg decimal-exact sums vs plain double sums (nondeterministic
  * combine order — what the engine would use if the oracle tolerated
  * run-to-run wobble). Feeds the README note on why DetAgg stays. */
object DecimalCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))

    def detAgg() = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      dsumD(col("l_quantity")).as("sum_qty"),
      dsumD(col("l_extendedprice")).as("sum_base_price"),
      dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
      dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax"))).as("sum_charge"),
      davg(col("l_quantity")).as("avg_qty"),
      davg(col("l_extendedprice")).as("avg_price"),
      davg(col("l_discount")).as("avg_disc"),
      count(lit(1)).as("count_order"))

    def plainAgg() = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      sum(col("l_quantity")).as("sum_qty"),
      sum(col("l_extendedprice")).as("sum_base_price"),
      sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
      sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax"))).as("sum_charge"),
      avg(col("l_quantity")).as("avg_qty"),
      avg(col("l_extendedprice")).as("avg_price"),
      avg(col("l_discount")).as("avg_disc"),
      count(lit(1)).as("count_order"))

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warmup
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-16s median ${ts(3)}%.3f s")
    }
    def dec18() = {
      val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        sum(col("l_quantity").cast(d18)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(d18)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).cast(d18)).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax"))).cast(d18)).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast(d18)).cast("double") / count(col("l_quantity"))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(d18)).cast("double") / count(col("l_extendedprice"))).as("avg_price"),
        (sum(col("l_discount").cast(d18)).cast("double") / count(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
    }
    def microLong() = li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      (sum(round(col("l_quantity") * 1e6d).cast("long")).cast("double") / 1e6d).as("sum_qty"),
      (sum(round(col("l_extendedprice") * 1e6d).cast("long")).cast("double") / 1e6d).as("sum_base_price"),
      (sum(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * 1e6d).cast("long")).cast("double") / 1e6d).as("sum_disc_price"),
      (sum(round(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax")) * 1e6d).cast("long")).cast("double") / 1e6d).as("sum_charge"),
      count(lit(1)).as("count_order"))

    time("detagg-38")(detAgg())
    time("detagg-18")(dec18())
    time("micro-long")(microLong())
    time("plain-double")(plainAgg())
    spark.stop()
  }
}
