// scratch timing probe: sbt "runMain graft.tools.TimeQ <query> <sfDir> <reps>"
package graft.tools

import org.apache.spark.sql.SparkSession

object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // scratch variants for A/B probes: q84's join WITHOUT the bloom
    // prune; "_nobc" suffix disables broadcast joins to reproduce the
    // big-build SMJ regime bloom pruning exists for
    if (name.endsWith("_nobc"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val baseName = name.stripSuffix("_nobc")
    def run(): org.apache.spark.sql.DataFrame =
      if (baseName == "q84_plain")
        // the registered q84 body with only the bloom prune disabled —
        // SAME method, so this baseline cannot drift from the query
        graft.operators.Scale.urgentMonthlyRevenue(spark, sfDir, prune = false)
      else graft.SparkEntry.queries(baseName)(spark, sfDir)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

// scratch plan probe: sbt "runMain graft.tools.ExplainQ <query> <sfDir>"
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // materialize df's OWN QueryExecution (a noop write would create a
    // separate one, leaving this AdaptiveSparkPlanExec un-finalized) and
    // unwrap to the plan AQE actually ran
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println(plan.toString)
    spark.stop()
  }
}
