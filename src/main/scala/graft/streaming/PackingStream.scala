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

  /** Right-to-be-forgotten EXECUTION against the packing ledger — the
    * one maintained mutable family where deletion cannot be a plain
    * anti-join (q153 prices exactly this: offsets are order-dependent,
    * so removing a document invalidates every window from its offset
    * on). The op is therefore a bounded SUFFIX rebuild:
    *   - the ledger PREFIX (rows strictly before the first tombstoned
    *     doc's offset) is untouched — at 100 TB with a recent deletion
    *     subject that is almost the whole ledger;
    *   - the suffix drops the tombstoned rows and recomputes offsets in
    *     the ledger's own concatenation order (old tok_offset — arrival
    *     order, NEVER a re-sort by doc_id), continuing from the
    *     prefix's token total, via the same two-level prefix-sum shape
    *     as [[graft.operators.Sampling.contextPacking]] (per-bucket
    *     subtotals cumulated over the tiny bucket frame, then parallel
    *     within-bucket running sums) — no global window over the
    *     suffix;
    *   - the result swaps in under the two-rename protocol; `batch_id`
    *     provenance rides through unchanged.
    * The repacked ledger equals the fresh pack over the survivors in
    * the original arrival order — the q145-oracle-over-survivors
    * contract q207 checks cross-engine. Re-running with the same
    * tombstones is a no-op (no tombstoned doc remains → early return).
    * Run offline, stream stopped (the rebalance/compaction contract). */
  def forget(spark: SparkSession, stateDir: String,
      tombstones: DataFrame): Unit = {
    val tomb = tombstones.select(col("doc_id")).distinct()
      .localCheckpoint(true) // read on both sides of the swap
    val led = ledgerState(spark, stateDir).localCheckpoint(true)
    // bounded one-row probe: the first affected offset (parquet
    // footer-stats min over the matched rows)
    val cutRow = led.join(broadcast(tomb), Seq("doc_id"))
      .agg(min(col("tok_offset"))).collect()(0)
    if (cutRow.isNullAt(0)) return // nothing to forget — replay no-op
    val cut = cutRow.getLong(0)
    val prefix = led.filter(col("tok_offset") < cut)
    // the ledger is dense (offsets are a running token sum), so the
    // prefix ends exactly at `cut`; recompute it anyway so a sparse
    // ledger (never produced today) could not silently corrupt offsets
    val baseRow = prefix
      .agg(coalesce(max(col("tok_offset") + col("n_tok")), lit(0L)))
      .collect()(0)
    val base = baseRow.getLong(0)
    val suffix = led.filter(col("tok_offset") >= cut)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    // two-level prefix sum over the suffix in arrival (old-offset) order
    val bucketTokens = 32768L
    val tok = suffix.withColumn("bkt",
      (col("tok_offset") / bucketTokens).cast("bigint"))
    val bktOff = tok.groupBy(col("bkt"))
      .agg(sum(col("n_tok")).as("bkt_tok"))
      .withColumn("bkt_off",
        coalesce(sum(col("bkt_tok")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("bkt"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("bkt"), col("bkt_off"))
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("tok_offset"))
      .rowsBetween(Long.MinValue, -1)
    val repacked = tok.join(broadcast(bktOff), "bkt")
      .withColumn("new_off",
        (coalesce(sum(col("n_tok")).over(local), lit(0L))
          + col("bkt_off") + lit(base)).cast("bigint"))
      .select(col("doc_id"), col("n_tok"), col("new_off").as("tok_offset"),
        col("batch_id"))
    val out = prefix.select(col("doc_id"), col("n_tok"), col("tok_offset"),
        col("batch_id"))
      .unionAll(repacked)
      .localCheckpoint(true) // materialize before the swap drops the source
    CorpusStateStream.swapState(spark, s"$stateDir/ledger")(tmp =>
      out.write.mode("overwrite").parquet(tmp))
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
