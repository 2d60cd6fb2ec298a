package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop probe: execute a registered query and print its FINAL
  * adaptive plan — the one place AQE stage reuse (ReusedExchange /
  * ReusedQueryStage) is visible. PlanProbe prints the initial plan,
  * which shows repeated subtrees even when execution dedupes them;
  * this tool is how the q169 shared-shingle-stream reuse was
  * confirmed before pinning it in PlanSpec.
  * Usage: runMain graft.tools.ReuseProbe <query> <sfDir> */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    // collect THIS frame: count() would build a separate QueryExecution
    // and leave df's own adaptive plan unfinalized (isFinalPlan=false,
    // no reuse nodes) — the exact pitfall this tool exists to avoid
    val n = df.collect().length
    println(s"=== EXECUTED FINAL PLAN ($n rows) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
