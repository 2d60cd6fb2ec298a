// scratch corpus-state-stream throughput probe:
//   sbt "runMain graft.tools.TimeCorpusState /root/testdata/sf0.1 10"
// Drives CorpusStateStream over the documents table as a real N-micro-
// batch stream (N file slices, maxFilesPerTrigger=1, AvailableNow) and
// reports docs/sec plus the per-batch floor — the incremental-ingest
// counterpart of TimeStream, so the state-maintenance claims carry a
// measured number (the anti-join-against-growing-state cost is the
// interesting curve: each batch probes everything appended so far).
package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CorpusStateStream

object TimeCorpusState {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    val n = docs.count()
    val root = Files.createTempDirectory("graft-timecorpus").toString
    docs.repartition(batches).write.mode("overwrite").parquet(s"$root/docs")

    val t0 = System.nanoTime()
    CorpusStateStream.start(spark, s"$root/docs", s"$root/state",
      s"$root/ckpt", availableNow = true, maxFilesPerTrigger = Some(1))
      .awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    // maxFilesPerTrigger=1 → one batch per input file; still count the
    // committed batches from the checkpoint offsets log rather than
    // assuming, EXCLUDING the hidden .crc checksum twins the local FS
    // writes beside every offsets file (counting them once doubled the
    // reported batch count and halved s/batch — review catch, r9)
    val nBatches = new java.io.File(s"$root/ckpt/offsets").list()
      .count(n => !n.startsWith("."))
    val shingles = CorpusStateStream.shingleState(spark, s"$root/state").count()
    val sigs = CorpusStateStream.sigState(spark, s"$root/state").count()
    println(f"[timecorpus] $n docs in $secs%.1f s over $nBatches batches = " +
      f"${n / secs}%.0f docs/s (${secs / nBatches}%.2f s/batch); " +
      f"state: $shingles distinct shingles, $sigs sigs")
    spark.stop()
  }
}
