package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage attribution — the dev-loop answer to "is this
  * query slow because one stage is heavy, or because it runs twelve
  * sequential driver rounds?" (guide §1: decide whether the time is
  * compute, shuffle, or scheduling BEFORE touching the code).
  *
  * Runs one registered query under a listener and prints, per job: wall
  * time, stage count, task count, executor-CPU sum and shuffle bytes —
  * so a 2.9 s query that spends 2.2 s across 11 jobs of 40 ms CPU each
  * is immediately visible as a choreography problem (fix: fewer
  * actions), not a compute problem (fix: the plan).
  *
  * Usage: sbt "runMain graft.tools.JobProbe <query> <sfDir> [reps]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    case class JobRec(id: Int, var start: Long = 0L, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var cpuNs: Long = 0L,
      var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var desc: String = "")
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.HashMap[Int, Int]()
    var enabled = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
        val r = JobRec(e.jobId, start = e.time)
        r.stages = e.stageInfos.size
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized { jobs(e.jobId) = r }
        e.stageIds.foreach(sid => stageToJob.synchronized { stageToJob(sid) = e.jobId })
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (enabled) {
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (enabled) {
        val jid = stageToJob.synchronized { stageToJob.get(e.stageId) }
        jid.foreach { j =>
          jobs.synchronized {
            jobs.get(j).foreach { r =>
              r.tasks += 1
              val m = e.taskMetrics
              if (m != null) {
                r.cpuNs += m.executorCpuTime
                r.shufRead += m.shuffleReadMetrics.totalBytesRead
                r.shufWrite += m.shuffleWriteMetrics.bytesWritten
              }
            }
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def runOnce(label: String): Unit = {
      jobs.synchronized { jobs.clear() }
      stageToJob.synchronized { stageToJob.clear() }
      enabled = true
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — let the tail of events drain
      Thread.sleep(300)
      enabled = false
      val snap = jobs.synchronized { jobs.values.toSeq }
      println(f"[jobprobe] $name $label: wall=$wall%.3f s, ${snap.size} jobs")
      var covered = 0.0
      snap.foreach { r =>
        val w = math.max(0L, r.end - r.start) / 1e3
        covered += w
        println(f"[jobprobe]   job ${r.id}%3d  wall=$w%7.3f s  stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d  cpu=${r.cpuNs / 1e9}%7.3f s  " +
          f"shufR=${r.shufRead / 1e6}%8.2f MB shufW=${r.shufWrite / 1e6}%8.2f MB  ${r.desc.take(60)}")
      }
      println(f"[jobprobe]   sum(job wall)=$covered%.3f s  gap(driver-only)=${wall - covered}%.3f s")
    }
    runOnce("warmup")
    (1 to reps).foreach(i => runOnce(s"run$i"))
    spark.stop()
  }
}
