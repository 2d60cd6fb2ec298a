// Plan-only scan: which registered queries end in a ROOT global Sort
// (the presentation sort the driver's sorted-rows compare ignores)?
// sbt "runMain graft.tools.RootSortScan <sfDir>"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Sort

object RootSortScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    var withSort, withLocalSort, without = 0
    graft.SparkEntry.all.foreach { q =>
      try {
        q.run(spark, sfDir).queryExecution.logical match {
          // only a GLOBAL root Sort is the presentation sort the strip
          // targets; a root sortWithinPartitions (global=false) is a
          // layout choice, counted separately
          case Sort(_, true, _, _) => withSort += 1
          case s: Sort =>
            withLocalSort += 1
            println(s"[rootsort] ${q.name}: root=LOCAL Sort (global=false, " +
              s"not a presentation sort) ${s.order.mkString(",").take(60)}")
          case other =>
            without += 1
            println(s"[rootsort] ${q.name}: root=${other.getClass.getSimpleName}")
        }
      } catch { case e: Throwable =>
        println(s"[rootsort] ${q.name}: ERR ${e.getMessage.take(80)}")
      }
    }
    println(s"[rootsort] with=$withSort withinPartitions=$withLocalSort " +
      s"without=$without")
    spark.stop()
  }
}
