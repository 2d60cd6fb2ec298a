package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Sampling

/** Incremental context packing — the streaming twin of q145's
  * concat-and-chunk assignment. A production ingest appends documents
  * continuously, and the packing ledger ("which 512-token training
  * window does each doc land in") must EXTEND, never recompute: this
  * `foreachBatch` stream assigns each arriving micro-batch its global
  * token offsets continuing from the persisted ledger's high-water
  * mark, using the same two-level prefix sum (Sampling.contextPacking)
  * inside the batch.
  *
  * State layout under `stateDir`:
  *   - `ledger/` — (doc_id, n_tok, tok_offset, batch_id), ONE parquet
  *     file per committed micro-batch; window spans derive from it as a
  *     pure projection ([[windows]] → Sampling.windowSpans, the q145
  *     definition), so only 32 bytes/doc persist.
  *
  * Exactly-once story: each batch's rows are staged to a side directory
  * and promoted into the ledger with a SINGLE file rename (atomic on
  * local/HDFS; an object store needs its committer), so a partial
  * multi-file job commit can never leave a half-appended batch. The
  * committed file's presence is the batch's commit marker — a replay
  * returns immediately — and two independent guards back it: the
  * anti-join on doc_id (re-derived rows of an already-applied batch
  * fold to an EMPTY append), and the base offset re-derived from the
  * LEDGER's max rather than a separately-advanced cursor. Those guards
  * also keep replays safe after compaction has folded the per-batch
  * files away (compact only with the stream stopped, as for
  * CorpusStateStream).
  *
  * Scale: per batch, cost is |batch| tokenization + the two-level
  * prefix sum + an anti-join against the ledger keyed on doc_id (8-byte
  * probe, pushdown on the state read) + a min/max footer-stats scan for
  * the base. The single-file batch commit also bounds the small-files
  * growth to one per batch; CorpusStateStream.compactState folds them. */
object PackingStream {

  val docSchema: StructType = CorpusStateStream.docSchema

  private val ledgerSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_tok", LongType),
    StructField("tok_offset", LongType),
    StructField("batch_id", LongType)))

  /** The persisted packing ledger — read through CorpusStateStream's
    * guarded state reader (empty before the first batch; a dangling
    * compaction `.old` fails loudly instead of reading as empty). */
  def ledgerState(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/ledger", ledgerSchema)

  /** Window spans derived from the ledger — q145's output shape, via
    * the SAME Sampling.windowSpans projection the batch query uses. */
  def windows(spark: SparkSession, stateDir: String,
      windowTokens: Int = 512): DataFrame =
    Sampling.windowSpans(
      ledgerState(spark, stateDir)
        .select(col("doc_id"), col("n_tok"), col("tok_offset")),
      windowTokens)

  /** One micro-batch: assign offsets continuing from the ledger's
    * high-water mark, stage, and promote with one atomic rename.
    * Calling it twice with the same batch is a no-op the second time —
    * the restart-recovery contract. */
  def update(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val ledgerDir = new Path(s"$stateDir/ledger")
    val fs = ledgerDir.getFileSystem(hconf)
    val stageDir = new Path(f"$stateDir/ledger_stage_$batchId%09d")
    fs.delete(stageDir, true) // stale staging from a crashed attempt
    val dest = new Path(ledgerDir, f"batch-$batchId%09d.parquet")
    // the committed file IS the commit marker: replay after a completed
    // promote has nothing to do
    if (fs.exists(dest)) return
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    val led = ledgerState(spark, stateDir)
    val fresh = docs.join(led.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // nothing new (replay of an already-applied batch whose marker was
    // compacted away): the guards make it a no-op without re-staging
    if (fresh.isEmpty) { fs.delete(stageDir, true); return }
    // bounded one-row metadata action (parquet footer min/max)
    val base = led
      .agg(coalesce(max(col("tok_offset") + col("n_tok")), lit(0L)).as("m"))
      .collect()(0).getLong(0)
    Sampling.contextPacking(fresh, windowTokens = 512, bucketDocs = 64)
      .select(col("doc_id"), col("n_tok"),
        (col("tok_offset") + lit(base)).as("tok_offset"),
        lit(batchId).as("batch_id"))
      .coalesce(1)
      .write.mode("overwrite").parquet(stageDir.toString)
    val part = fs.listStatus(stageDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"staged batch $batchId produced no parquet part under $stageDir"))
    fs.mkdirs(ledgerDir)
    require(fs.rename(part, dest), s"could not promote $part to $dest")
    fs.delete(stageDir, true)
  }

  /** Start the packing stream over a directory of arriving document
    * parquet files (the shared CorpusStateStream starter). */
  def start(
      spark: SparkSession,
      docsDir: String,
      stateDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      triggerSeconds: Int = 10,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    CorpusStateStream.startDocStream(spark, docsDir, checkpointDir,
      availableNow, triggerSeconds, maxFilesPerTrigger)(update(stateDir) _)
}
