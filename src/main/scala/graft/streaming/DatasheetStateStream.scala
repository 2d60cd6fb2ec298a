package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.wsTokens

/** The release datasheet (q156) maintained incrementally — the last
  * report in the repo that still required a full-corpus batch pass now
  * serves from persisted state: a `foreachBatch` stream folds each
  * arriving document batch into additive counters, distinct-key sets,
  * and the signature table, and [[datasheetFromState]] reassembles the
  * EXACT q156 (metric, value) table from those — proven row-for-row
  * equal to `Dedup.datasetDatasheet` over all delivered documents
  * (DatasheetStreamSpec), so a data card can be quoted per micro-batch
  * without ever rescanning the corpus.
  *
  * State layout under `stateDir` (shared with [[CorpusStateStream]] —
  * this stream COMPOSES its update, so the signature/shingle tables are
  * maintained once and serve both the dedup probes and the datasheet):
  *   - `sigs/`, `shingles/` — via [[CorpusStateStream.update]];
  *   - `langs/`, `sources/` — distinct-key set tables (anti-join
  *     idempotent, the shingle-table pattern; nulls filtered exactly as
  *     countDistinct ignores them);
  *   - `words/` — distinct xxhash64(lowercased word) set — q156's
  *     vocab_size hash domain VERBATIM (the md5-domain `vocab/` delta
  *     table serves the LM family; the two domains collide differently,
  *     so sharing one would break state==batch bit-equality);
  *   - `ds_counters/` — one (batch_id, n_docs, n_tokens, n_flagged) row
  *     per batch (flags = [[graft.operators.TextAnalysis.gateFlags]],
  *     the q105 definition — per-document, hence batch-additive);
  *   - `ds_prefixes/` — (batch_id, prefix, delta) template-prefix count
  *     deltas, keyed by the RAW 80-code-point prefix (hashing the key
  *     would admit collisions the batch groupBy does not have);
  *   - `ds_ledger/` — the committed-batch ledger for the two delta
  *     tables (the vocab-ledger crash-window protocol: deltas append
  *     before the ledger row; a replay probes the delta log itself and
  *     only heals the ledger — counts can never double).
  *
  * Identity note: `doc_id` is the state identity key (the family
  * convention) — a re-uploaded doc_id contributes its counters again
  * (the batch twin over the concatenated deliveries counts rows too)
  * but keeps its FIRST signature, exactly like the corpus stream.
  *
  * Deletion note: this family has NO forget op, deliberately. The
  * additive tables (`ds_counters`, `ds_prefixes`) could net a deletion
  * out exactly as [[BoilerplateStateStream.forget]] and
  * [[CorpusStateStream.forgetVocab]] do (negative ledger deltas) — but
  * the datasheet also reads the SET tables (`langs`, `sources`,
  * `words`, the distinct-shingle set), and a set membership cannot be
  * un-asserted without knowing whether any SURVIVING document still
  * holds the key, i.e. without a reference count the set layout chose
  * not to pay for (16 B/key vs 24 B/key at 100 TB, and anti-join
  * idempotence instead of a ledger). Executing right-to-be-forgotten
  * against a datasheet therefore means either upgrading the set tables
  * to df-counted layouts (then the negative-delta machinery applies
  * unchanged) or re-deriving them from the surviving signature table —
  * both corpus-free, neither free; q199/q200/q201 cover the families
  * where deletion is already exact.
  *
  * Scale: per batch, one |batch| projection per table family, anti-joins
  * against state read with pushdown on the key column, and one appended
  * counter row; the read side is counters-sum + set-table counts + the
  * capped band join over 16 bytes/doc of signatures + a |distinct
  * prefixes|-key aggregate — the corpus text is never rescanned. */
object DatasheetStateStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private val countersSchema = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("n_docs", LongType),
    StructField("n_tokens", LongType),
    StructField("n_flagged", LongType)))

  private val prefixesSchema = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("prefix", StringType),
    StructField("delta", LongType)))

  private val ledgerSchema = StructType(Seq(StructField("batch_id", LongType)))

  private def stateDf(spark: SparkSession, dir: String, s: StructType) =
    CorpusStateStream.stateDf(spark, dir, s)

  private def setState(spark: SparkSession, stateDir: String, table: String,
      field: StructField): DataFrame =
    stateDf(spark, s"$stateDir/$table", StructType(Seq(field)))

  /** One micro-batch: fold the arrivals into every datasheet state
    * table. Idempotent under replay (set tables by anti-join, delta
    * tables by the ledger protocol, sigs/shingles by the corpus
    * stream's own anti-joins). */
  def update(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    require(batchId >= 0, "batchId must be non-negative (negative ids " +
      "are reserved for folded snapshot rows)")
    val spark = batch.sparkSession
    val docs = batch
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .localCheckpoint()

    // shared signature/shingle maintenance — ONE definition with the
    // dedup probes (CorpusStateStream is the single writer of sigs/)
    CorpusStateStream.update(stateDir)(
      docs.select(col("doc_id"), col("text"), col("source")), batchId)

    def appendNewKeys(table: String, field: StructField, keys: DataFrame): Unit =
      keys.distinct().na.drop()
        .join(setState(spark, stateDir, table, field), Seq(field.name), "left_anti")
        .write.mode("append").parquet(s"$stateDir/$table")

    appendNewKeys("langs", StructField("lang", StringType),
      docs.select(col("lang")))
    appendNewKeys("sources", StructField("source", StringType),
      docs.select(col("source")))
    appendNewKeys("words", StructField("w", LongType),
      docs.select(explode(wsTokens(lower(col("text")))).as("tok"))
        .select(xxhash64(col("tok")).as("w")))

    // delta tables, vocab-ledger protocol: probe ledger → probe each
    // delta log → append missing → heal ledger last
    val ledgerDir = s"$stateDir/ds_ledger"
    val seen = stateDf(spark, ledgerDir, ledgerSchema)
      .filter(col("batch_id") === batchId).limit(1).count() > 0
    if (!seen) {
      val inCounters = stateDf(spark, s"$stateDir/ds_counters", countersSchema)
        .filter(col("batch_id") === batchId).limit(1).count() > 0
      if (!inCounters) {
        graft.operators.TextAnalysis.gateFlags(docs)
          .select(col("nt"),
            (col("f_short") || col("f_low_ttr") || col("f_bad_len") ||
              col("f_dup")).as("f"))
          .agg(count(lit(1)).as("n_docs"), coalesce(sum(col("nt")), lit(0L))
              .as("n_tokens"),
            coalesce(sum(when(col("f"), 1L).otherwise(0L)), lit(0L))
              .as("n_flagged"))
          .select(lit(batchId).as("batch_id"), col("n_docs"),
            col("n_tokens"), col("n_flagged"))
          .write.mode("append").parquet(s"$stateDir/ds_counters")
      }
      val inPrefixes = stateDf(spark, s"$stateDir/ds_prefixes", prefixesSchema)
        .filter(col("batch_id") === batchId).limit(1).count() > 0
      if (!inPrefixes) {
        docs.groupBy(substring(col("text"), 1, 80).as("prefix"))
          .agg(count(lit(1)).as("delta"))
          .select(lit(batchId).as("batch_id"), col("prefix"), col("delta"))
          .write.mode("append").parquet(s"$stateDir/ds_prefixes")
      }
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").parquet(ledgerDir)
    }
  }

  /** The q156 datasheet table served FROM state — same metrics, same
    * (metric, value) shape, same ordering; DatasheetStreamSpec pins it
    * row-for-row equal to `Dedup.datasetDatasheet` over all delivered
    * documents. The near-dup metric runs q156's capped pair stage over
    * the persisted signatures
    * ([[graft.operators.Dedup.simhashNearDupPairsCappedFromSigs]] — the
    * same banding/cap/verify definition), so at a binding cap the
    * equality contract is the batch one: identical pair semantics over
    * identical signatures. */
  def datasheetFromState(spark: SparkSession, stateDir: String,
      maxBucket: Int = graft.operators.Dedup.DefaultMaxBucket): DataFrame = {
    def one(metric: String, v: DataFrame): DataFrame =
      v.select(lit(metric).as("metric"), col(v.columns.head).cast("double")
        .as("value"))
    val c = stateDf(spark, s"$stateDir/ds_counters", countersSchema)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
        coalesce(sum(col("n_flagged")), lit(0L)).as("n_flagged"))
      .localCheckpoint(true)
    val members = graft.operators.Dedup.simhashNearDupPairsCappedFromSigs(
        CorpusStateStream.sigState(spark, stateDir), maxHamming = 8, maxBucket)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
      .agg(count(lit(1)).as("members"))
    val tpl = stateDf(spark, s"$stateDir/ds_prefixes", prefixesSchema)
      .groupBy(col("prefix")).agg(sum(col("delta")).as("n"))
      .filter(col("n") >= 2)
      .agg(coalesce(sum(col("n")), lit(0L)).as("tdocs"))
    one("n_docs", c.select(col("n_docs")))
      .unionByName(one("n_tokens", c.select(col("n_tokens"))))
      .unionByName(one("n_langs", setState(spark, stateDir, "langs",
        StructField("lang", StringType)).agg(count(lit(1)).as("n"))))
      .unionByName(one("n_sources", setState(spark, stateDir, "sources",
        StructField("source", StringType)).agg(count(lit(1)).as("n"))))
      .unionByName(one("mean_tokens_per_doc", c.select(
        // guarded: an empty state reads as NULL rather than an ANSI
        // divide-by-zero (the batch twin never runs on zero docs)
        when(col("n_docs") > 0,
          col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("m"))))
      .unionByName(one("vocab_size", setState(spark, stateDir, "words",
        StructField("w", LongType)).agg(count(lit(1)).as("n"))))
      .unionByName(one("flagged_docs", c.select(col("n_flagged"))))
      .unionByName(one("neardup_member_docs", members))
      .unionByName(one("template_docs", tpl))
      .orderBy(col("metric"))
  }

  /** Fold both committed delta logs into snapshots —
    * [[CorpusStateStream.foldDeltaState]] on the per-batch counters
    * (one global snapshot row) and the template-prefix counts (one row
    * per surviving prefix). They share `ds_ledger`, so one fold call
    * per table with the same ledger. Returns
    * ((counters before, after), (prefixes before, after)). */
  def foldDeltas(spark: SparkSession, stateDir: String)
      : ((Long, Long), (Long, Long)) =
    (CorpusStateStream.foldDeltaState(spark, stateDir, "ds_counters",
        "ds_ledger", countersSchema, Seq.empty,
        Seq("n_docs", "n_tokens", "n_flagged")),
      CorpusStateStream.foldDeltaState(spark, stateDir, "ds_prefixes",
        "ds_ledger", prefixesSchema, Seq("prefix"), Seq("delta")))

  /** Start the maintenance stream (the CorpusStateStream wiring with the
    * lang-bearing schema). `foldEvery = Some(n)` runs [[foldDeltas]]
    * from the stream's own quiet window after every n-th committed
    * batch (the [[CentroidStateStream.start]] contract: sequential
    * micro-batches + single writer make the in-stream fold race-free),
    * bounding both delta logs at |keys| + n batches of rows; ledger
    * rows persist (replay probes) but its files compact with the fold. */
  def start(
      spark: SparkSession,
      docsDir: String,
      stateDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      triggerSeconds: Int = 10,
      maxFilesPerTrigger: Option[Int] = None,
      foldEvery: Option[Int] = None): StreamingQuery =
    CorpusStateStream.startDocStream(spark, docsDir, checkpointDir,
      availableNow, triggerSeconds, maxFilesPerTrigger, docSchema,
      foldEvery, s => { foldDeltas(s, stateDir); () })(
      update(stateDir) _)
}
