package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the optimized plan of one registered query — the dev-loop tool
  * behind 'did this refactor change the plan or just the source?'. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (name, sfDir) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.optimizedPlan.treeString)
    df.explain("formatted")
    spark.stop()
  }
}
