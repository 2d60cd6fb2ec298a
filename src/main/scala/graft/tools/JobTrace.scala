// scratch job-composition probe: sbt "runMain graft.tools.JobTrace <query> <sfDir>"
package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val descs = mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = descs.synchronized {
        descs += j.stageInfos.map(s => s"${s.name.takeWhile(_ != '.')}(${s.numTasks})")
          .mkString("+")
      }
    })
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.stop()
    println(s"[jobtrace] total=${descs.length}")
    descs.groupBy(identity).toSeq.sortBy(-_._2.length).foreach { case (d, v) =>
      println(f"[jobtrace] ${v.length}%4d  ${d.take(140)}")
    }
  }
}
