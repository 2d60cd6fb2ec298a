// scratch delta-fold maintenance probe:
//   sbt "runMain graft.tools.FoldProbe /root/testdata/sf0.1 16"
// Builds the two additive delta-log states (reference vocab, centroid
// sums) from N micro-batches, times the state-served reads against the
// unfolded |keys|·|batches|-row log, runs the fold, and re-times the
// same reads against the |keys|-row snapshot — so the foldDeltaState
// claims (row bound, unchanged results, cheaper reads) carry measured
// numbers instead of an argument. Read timing is the Bench convention:
// one untimed warmup, then the median of 3 noop-sink executions.
package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{CentroidStateStream, CorpusStateStream}

object FoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def median3(df: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // untimed warmup
      Seq.fill(3)(once()).sorted.apply(1)
    }

    // ---- vocab: |terms|·|batches| deltas → |terms| snapshot rows ----
    val root = Files.createTempDirectory("graft-foldprobe").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("source"))
    (0 until batches).foreach(i => CorpusStateStream.updateVocab(s"$root/v")(
      docs.filter(col("doc_id") % batches === i), i.toLong))
    val arrivals = docs.filter(col("doc_id") % 7 === 0)
    val preV = median3(
      CorpusStateStream.lmScoreAgainstState(s"$root/v", arrivals))
    val tf0 = System.nanoTime()
    val (vb, va) = CorpusStateStream.foldVocab(spark, s"$root/v")
    val foldVSecs = (System.nanoTime() - tf0) / 1e9
    val postV = median3(
      CorpusStateStream.lmScoreAgainstState(s"$root/v", arrivals))
    println(f"[foldprobe] vocab: $batches batches, $vb -> $va rows " +
      f"(fold $foldVSecs%.1f s); lmScoreAgainstState $preV%.2f -> $postV%.2f s")

    // ---- centroid sums: |sources|·64·|batches| → |sources|·64 rows ----
    val vecs = docs.select(col("doc_id"), col("source"))
      .join(graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select(col("vec_id"), col("embedding"), col("source"))
    (0 until batches).foreach(i => CentroidStateStream.update(s"$root/c")(
      vecs.filter(col("vec_id") % batches === i), i.toLong))
    val preC = median3(
      CentroidStateStream.driftMatrixFromState(spark, s"$root/c"))
    val tc0 = System.nanoTime()
    val (cb, ca) = CentroidStateStream.foldDeltas(spark, s"$root/c")
    val foldCSecs = (System.nanoTime() - tc0) / 1e9
    val postC = median3(
      CentroidStateStream.driftMatrixFromState(spark, s"$root/c"))
    println(f"[foldprobe] cent: $batches batches, $cb -> $ca rows " +
      f"(fold $foldCSecs%.1f s); driftMatrixFromState $preC%.2f -> $postC%.2f s")
    spark.stop()
  }
}
