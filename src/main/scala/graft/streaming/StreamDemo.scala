package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable example of the streaming surface: stages the sf0.001 events
  * table as a file-source stream, runs the watermarked tumbling-window
  * aggregation and the bounded dedup, and prints their outputs.
  *
  * Usage: sbt "runMain graft.streaming.StreamDemo [sfDir]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-stream-demo").toString
    val batch = graft.Tables.events(spark, sfDir)
    batch.write.mode("overwrite").parquet(dir)
    batch.write.mode("append").parquet(dir) // duplicate delivery for dedup demo
    val src = spark.readStream.schema(batch.schema).parquet(dir)

    val tq = EventStreams.tumbling(src).writeStream
      .format("memory").queryName("demo_tumbling").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    val dq = EventStreams.dedupWithinWatermark(src, "90 days").writeStream
      .format("memory").queryName("demo_dedup").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    tq.awaitTermination(); dq.awaitTermination()

    val tumbled = spark.table("demo_tumbling")
    println(s"[demo] input events (with duplicate delivery): ${batch.count() * 2}")
    println(s"[demo] tumbling windows produced: ${tumbled.count()}")
    tumbled.orderBy("window_start", "event_type").show(6, truncate = false)
    println(s"[demo] events after dedupWithinWatermark: ${spark.table("demo_dedup").count()}")
    spark.stop()
  }
}
