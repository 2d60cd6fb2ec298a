// scratch per-stage wall-clock probe (warm JVM, second run measured):
//   sbt "runMain graft.tools.StageProbe <query> <sfDir>"
// Prints each completed stage's duration and task count — the tool that
// found q33's 965 ms single-task stage (a localCheckpoint freezing the
// 1-split parquet partitioning, r10). TimeQ answers "how long"; this
// answers "where".
package graft.tools
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm run
    graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val stages = mutable.ArrayBuffer.empty[(String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.synchronized {
        val i = s.stageInfo
        val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
        stages += ((i.name.take(80), ms.getOrElse(-1L), i.numTasks))
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[stageprobe] total ${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(500)
    stages.foreach { case (n, ms, t) => println(f"[stageprobe] ${ms}%6d ms  $t%3d tasks  $n") }
    spark.stop()
  }
}
