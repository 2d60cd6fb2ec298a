package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DetAgg._

/** One-off A/B probes for the r17 optimization round — each variant is
  * the registered query's body with ONE structural change, timed in the
  * same JVM so the comparison is ambient-free (the r12 convention).
  * Scratch code: variants here are never registered and never leave
  * this file.
  *
  * Usage: sbt "runMain graft.tools.ScratchProbe <variant> <sfDir> <reps>"
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    def q01Body(li: DataFrame): DataFrame =
      li.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsumD(col("l_quantity")).as("sum_qty"),
          dsumD(col("l_extendedprice")).as("sum_base_price"),
          dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
          dsumD(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))

    def q01PlainBody(li: DataFrame): DataFrame =
      li.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount")) * (lit(1.0d) + col("l_tax"))).as("sum_charge"),
          avg(col("l_quantity")).as("avg_qty"),
          avg(col("l_extendedprice")).as("avg_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))

    val n = spark.sparkContext.defaultParallelism

    def df(): DataFrame = variant match {
      case "q01_asis"   => q01Body(Tables.lineitem(spark, sfDir))
      case "q01_repart" => q01Body(Tables.lineitem(spark, sfDir)
        .select("l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax").repartition(n))
      case "q01_plain"  => q01PlainBody(Tables.lineitem(spark, sfDir))
      case "q01_plain_repart" => q01PlainBody(Tables.lineitem(spark, sfDir)
        .select("l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax").repartition(n))
      case "scan_only"  => Tables.lineitem(spark, sfDir)
        .select("l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
      case "repart_only" => Tables.lineitem(spark, sfDir)
        .select("l_shipdate", "l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax").repartition(n)
      case "q50_asis" =>
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
            expr("percentile(l_extendedprice, array(0.25, 0.95))").as("_p"))
          .select(col("l_returnflag"), col("median_qty"),
            round(col("_p").getItem(0), 6).as("p25_price"),
            round(col("_p").getItem(1), 6).as("p95_price"))
          .orderBy(col("l_returnflag"))
      case "q50_repart" =>
        Tables.lineitem(spark, sfDir)
          .select("l_returnflag", "l_quantity", "l_extendedprice")
          .repartition(n)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
            expr("percentile(l_extendedprice, array(0.25, 0.95))").as("_p"))
          .select(col("l_returnflag"), col("median_qty"),
            round(col("_p").getItem(0), 6).as("p25_price"),
            round(col("_p").getItem(1), 6).as("p95_price"))
          .orderBy(col("l_returnflag"))
      case "q130_asis" =>
        graft.operators.TextAnalysis.bigramLmScore(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("source"), col("text")))
      case "q130_fan" =>
        graft.operators.TextAnalysis.bigramLmScore(
          Tables.documents(spark, sfDir).select(col("doc_id"), col("source"), col("text"))
            .repartition(n))
      case "q82_asis" | "q82_fan" =>
        import spark.implicits._
        val W = 1024
        def bucket(j: Column, k: Column): Column =
          pmod(conv(substring(md5(concat(j.cast("string"), lit("|"), k.cast("string"))),
            1, 8), 16, 10).cast("long"), lit(W.toLong))
        def jBuckets(k: Column): Column =
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("j"), bucket(lit(j), k).as("b"))): _*))
        val src0 = Tables.orders(spark, sfDir)
          .select(col("o_orderpriority").as("g"), col("o_custkey").as("k"))
        val src = if (variant == "q82_fan") src0.repartition(n) else src0
        val cms = src.select(col("g"), jBuckets(col("k")).as("jb"))
          .groupBy(col("g"), col("jb.j").as("j"), col("jb.b").as("b"))
          .agg(count(lit(1)).as("c"))
        val probes = Seq(1L, 7L, 42L).toDF("probe")
        val grid = src.select(col("g")).distinct().crossJoin(broadcast(probes))
        val pb = grid.select(col("g"), col("probe"), jBuckets(col("probe")).as("jb"))
          .select(col("g"), col("probe"), col("jb.j").as("j"), col("jb.b").as("b"))
        val est = pb.join(cms, Seq("g", "j", "b"), "left")
          .groupBy(col("g"), col("probe"))
          .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
        val exact = src.filter(col("k").isin(1L, 7L, 42L))
          .groupBy(col("g"), col("k").as("probe"))
          .agg(count(lit(1)).as("exact_count"))
        est.join(exact, Seq("g", "probe"), "left")
          .select(col("g").as("o_orderpriority"), col("probe").as("probe_custkey"),
            col("est_count"), coalesce(col("exact_count"), lit(0L)).as("exact_count"))
          .orderBy(col("o_orderpriority"), col("probe_custkey"))
      case other => throw new IllegalArgumentException(other)
    }

    // warmup
    df().write.format("noop").mode("overwrite").save()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      df().write.format("noop").mode("overwrite").save()
      println(f"[scratch] $variant run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
