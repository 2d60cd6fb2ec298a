package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Tables

/** One-off diagnostic: measure the hot-bucket / document-frequency
  * distributions the capped dedup stages guard against, at a given SF —
  * used to pick cap values that are INERT on testdata (capped output is
  * byte-identical to uncapped, DedupScaleSpec's precondition) while
  * still being the values a 100 TB run would ship with. Also times the
  * capped vs uncapped candidate stages head-to-head. */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    val df = Dedup.hashedShingles(docs).groupBy(col("h")).count()
    println("shingle df: " + df.agg(max("count").as("max_df"),
      expr("percentile(count, 0.999)").as("p999")).collect().head)
    val buckets = Dedup.simhashBands(Dedup.simhashSigs(docs))
      .groupBy(col("band"), col("bv")).count()
    println("simhash bucket: " + buckets.agg(max("count").as("max"),
      expr("percentile(count, 0.999)").as("p999")).collect().head)
    println("docs: " + docs.count())

    def time[A](label: String)(f: => A): Unit = {
      f // warmup
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-28s median ${ts(2)}%.3f s")
    }
    time("simhash uncapped") {
      Dedup.simhashNearDupPairs(docs, 8).write.format("noop").mode("overwrite").save()
    }
    time("simhash capped") {
      Dedup.simhashNearDupPairsCapped(docs, 8, 1000).write.format("noop").mode("overwrite").save()
    }
    time("jaccard uncapped") {
      Dedup.ngramJaccardPairs(docs, 0.3).write.format("noop").mode("overwrite").save()
    }
    time("jaccard capped") {
      Dedup.ngramJaccardPairsCapped(docs, 0.3, 1000).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
