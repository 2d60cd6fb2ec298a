// scratch IVF-state-stream throughput probe:
//   sbt "runMain graft.tools.TimeIvfState /root/testdata/sf0.1 10"
// Drives IvfStateStream over the embeddings table as a real N-micro-
// batch stream (train once on the full corpus, then fold file slices at
// maxFilesPerTrigger=1 under AvailableNow) and reports vecs/sec plus the
// per-batch floor, then times one q49-shaped top-k and one q139-shaped
// stats read SERVED FROM STATE — the numbers behind the "no Lloyd chain
// at query time" claim (compare against the one-shot ivfTopK, which
// pays the chain per run).
package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.streaming.IvfStateStream

object TimeIvfState {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val root = Files.createTempDirectory("graft-timeivf").toString
    emb.repartition(batches).write.mode("overwrite").parquet(s"$root/emb")

    val tTrain0 = System.nanoTime()
    val nlist = graft.operators.Similarity.autoNlist(n)
    IvfStateStream.train(emb, s"$root/state", nlist)
    val trainSecs = (System.nanoTime() - tTrain0) / 1e9
    val tPq0 = System.nanoTime()
    IvfStateStream.trainPq(emb, s"$root/state")
    val pqTrainSecs = (System.nanoTime() - tPq0) / 1e9
    println(f"[timeivf] trainPq(m=4, ksub=16): $pqTrainSecs%.1f s")

    val t0 = System.nanoTime()
    IvfStateStream.startPq(spark, s"$root/emb", s"$root/state",
      s"$root/ckpt", availableNow = true, maxFilesPerTrigger = Some(1))
      .awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val nBatches = new java.io.File(s"$root/ckpt/offsets").list()
      .count(f => !f.startsWith("."))
    val stored = IvfStateStream.listState(spark, s"$root/state").count()

    def timed(label: String)(f: => Long): Unit = {
      val t = System.nanoTime()
      val rows = f
      println(f"[timeivf] $label: ${(System.nanoTime() - t) / 1e9}%.2f s ($rows rows)")
    }
    println(f"[timeivf] train(nlist=$nlist): $trainSecs%.1f s; " +
      f"fold $n vecs in $secs%.1f s over $nBatches batches = " +
      f"${n / secs}%.0f vecs/s (${secs / nBatches}%.2f s/batch); state: $stored rows")
    timed("topKFromState (no Lloyd chain)") {
      IvfStateStream.topKFromState(spark, s"$root/state",
        Seq(0L, 100L, 200L), k = 10).count()
    }
    timed("listStatsFromState") {
      IvfStateStream.listStatsFromState(spark, s"$root/state").count()
    }
    timed("adcTopKFromState (codes + codebooks only)") {
      IvfStateStream.adcTopKFromState(spark, s"$root/state",
        Seq(0L, 100L, 200L), k = 10).count()
    }
    timed("one-shot ivfTopK (pays the chain)") {
      graft.operators.Similarity.ivfTopK(emb, Seq(0L, 100L, 200L), k = 10,
        nlist = nlist).count()
    }
    spark.stop()
  }
}
