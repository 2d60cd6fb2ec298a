package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

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
  *   - `ledger/` — (doc_id, n_tok, tok_offset, batch_id) appended per
  *     micro-batch; window spans derive from it as a pure projection
  *     ([[windows]]), so only 32 bytes/doc persist.
  *
  * Exactly-once story (the CorpusStateStream contract): the anti-join
  * on doc_id makes the ledger append idempotent under batch replay,
  * and the base offset is re-derived from the LEDGER's max — never
  * from a separately-advanced cursor — so a crash between the ledger
  * commit and the sink commit replays into a no-op with the high-water
  * mark already correct. Parquet commits task output atomically, so a
  * half-written append is never visible.
  *
  * Scale: per batch, cost is |batch| tokenization + the two-level
  * prefix sum + an anti-join against the ledger keyed on doc_id (8-byte
  * probe, pushdown on the state read) + a min/max footer-stats scan for
  * the base. The ledger only ever receives appends; compaction is
  * CorpusStateStream.compactState (pure file-level swap). */
object PackingStream {

  val docSchema: StructType = CorpusStateStream.docSchema

  private val ledgerSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_tok", LongType),
    StructField("tok_offset", LongType),
    StructField("batch_id", LongType)))

  /** The persisted packing ledger (empty frame before the first batch). */
  def ledgerState(spark: SparkSession, stateDir: String): DataFrame = {
    val dir = s"$stateDir/ledger"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(ledgerSchema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ledgerSchema)
  }

  /** Window spans derived from the ledger — q145's output shape, as a
    * pure projection over the persisted offsets. */
  def windows(spark: SparkSession, stateDir: String,
      windowTokens: Int = 512): DataFrame = {
    val wt = windowTokens
    ledgerState(spark, stateDir)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        expr(s"tok_offset div $wt").cast("bigint").as("start_window"),
        expr(s"(tok_offset + n_tok - 1) div $wt").cast("bigint")
          .as("end_window"),
        (expr(s"(tok_offset + n_tok - 1) div $wt")
          - expr(s"tok_offset div $wt") + lit(1L)).cast("bigint")
          .as("n_windows"),
        (expr(s"(tok_offset + n_tok - 1) div $wt")
          > expr(s"tok_offset div $wt")).as("fragmented"))
      .orderBy(col("doc_id"))
  }

  /** One micro-batch: assign offsets continuing from the ledger's
    * high-water mark and append. Calling it twice with the same batch is
    * a no-op the second time — the restart-recovery contract. */
  def update(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    val led = ledgerState(spark, stateDir)
    val fresh = docs.join(led.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // bounded one-row metadata action (parquet footer min/max)
    val base = led
      .agg(coalesce(max(col("tok_offset") + col("n_tok")), lit(0L)).as("m"))
      .collect()(0).getLong(0)
    Sampling_contextPacking(fresh)
      .select(col("doc_id"), col("n_tok"),
        (col("tok_offset") + lit(base)).as("tok_offset"),
        lit(batchId).as("batch_id"))
      .write.mode("append").parquet(s"$stateDir/ledger")
  }

  // q145's two-level prefix sum, applied within the batch
  private def Sampling_contextPacking(docs: DataFrame): DataFrame =
    graft.operators.Sampling.contextPacking(docs, windowTokens = 512,
      bucketDocs = 64)

  /** Start the packing stream over a directory of arriving document
    * parquet files (the CorpusStateStream.start shape). */
  def start(
      spark: SparkSession,
      docsDir: String,
      stateDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      triggerSeconds: Int = 10,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader
      .parquet(docsDir)
      .writeStream
      .trigger(
        if (availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(update(stateDir) _)
      .start()
  }
}
