package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incrementally maintained INVERTED INDEX — the lexical sibling of the
  * vector indexes ([[IvfStateStream]], [[LshStateStream]]): production
  * tokenizes each document ONCE at ingest and answers every keyword
  * query from the persisted postings, which is what makes BM25 over a
  * 100 TB corpus affordable (the batch q215 re-tokenizes the corpus per
  * invocation — the right shape for one ad-hoc query, exactly the wrong
  * one for a search service). The serving read routes through the SAME
  * `Similarity.bm25FromPostings` scorer (and the postings derive from
  * the SAME `Similarity.bm25Postings` tokenizer) the batch operator
  * uses, so a state-served page can never drift from its batch twin.
  *
  * State layout under `stateDir` (v3 — r17 added `doclens/` and
  * `lexstats/` so the serving read is QUERY-bounded, then `poslists/`
  * so PHRASE queries serve from state too; a v1/v2 dir has no marker /
  * the wrong one and fails loudly with the rebuild instruction):
  *   - `postings/` — (doc_id, w, tf), keyed by the RAW lowercased
  *     token deliberately (not the family's usual 64-bit hash): a
  *     keyword index's terms ARE the searchable surface, not sensitive
  *     derived state, and the raw key keeps the served page
  *     bit-comparable cross-engine with no hash-domain caveat (the
  *     boilerplate blacklist's reviewability rationale);
  *   - `poslists/` — (doc_id, pos, w): POSITIONAL postings, the q222
  *     phrase operator's serving tier (bag-of-words BM25 cannot see
  *     adjacency; phrase/proximity queries need token positions).
  *     Derived from the SAME tokenize pass as `postings/` in [[update]]
  *     — the tf tier is exactly the positional tier's (doc, w) counts,
  *     so the two can never disagree;
  *   - `lexdocs/` — (doc_id): every delivered document, token-less
  *     ones included. BM25's N counts ALL documents (a token-less doc
  *     shifts idf but never scores), so N cannot derive from postings;
  *   - `doclens/` — (doc_id, dl): per-document token count, complete at
  *     ingest (a doc's postings land in one batch). BM25 needs each
  *     CANDIDATE's dl; without this table the read would re-aggregate
  *     it from the full postings per query (the r16 `weak`);
  *   - `lexstats/` — (batch_id, n_dl_docs, sum_dl): one additive
  *     counter row per batch over the docs that batch ADDED (those
  *     with ≥1 token, and their total tokens), so avgdl = Σ sum_dl /
  *     Σ n_dl_docs is a tiny-table fold, never a corpus aggregate.
  *     Exact integers — batch order cannot perturb the sums.
  *
  * The key tables are keyed 1:1 by doc_id with no trained model
  * attached — the [[LshStateStream]] deletion class: [[forget]] is
  * COMPLETE erasure by broadcast anti-join + two-rename swap on
  * postings/poslists/lexdocs/doclens, and the lexstats counter is rewritten to
  * ONE snapshot row recomputed from the surgically surviving postings
  * (exact, so the served avgdl is automatically the survivors-only
  * value). Since r17 the multi-table rewrite runs under a staged
  * `forget_pending/` marker holding the tombstone set: reads refuse
  * mid-window (a crash between swaps would otherwise silently serve an
  * idf whose N still counts deleted documents — advisor catch, r16)
  * and [[recoverForget]] heals any window by replaying the idempotent
  * body from the stored tombstones. After a forget, a deleted document
  * can neither match a query term (no postings) nor shift any score
  * (no df/N/avgdl contribution) — the property q218 proves under the
  * hash gate against a full survivor recompute.
  *
  * Exactly-once: the corpus stream's contract. poslists, postings and
  * lexdocs append only rows their OWN anti-join hasn't seen; the
  * lexstats row appends under a batch_id probe, computed from the docs
  * new to the REGISTRY and ordered poslists → postings → lexstats →
  * lexdocs so every crash window heals on replay (postings-only crash:
  * the registry still misses the docs, so the delta recomputes
  * correctly; stats-written crash: the probe skips it; full replay:
  * every table skips).
  *
  * Scale: per batch, one |batch| tokenize into a map-side-combined
  * (doc, term) aggregate + pushdown anti-joins on the 8-byte key. A
  * query reads postings twice with PUSHDOWN — once restricted to the
  * page's query ids, once to their collected term set (at deployment
  * scale, bucket `postings/` by w so the probe is partition-pruned) —
  * probes `doclens/` for the candidates' lengths, and takes N and
  * avgdl from a footer-stats count and the one-row counter fold:
  * query-bounded work, never a corpus-proportional aggregate. */
object LexicalStateStream {

  val docSchema: StructType = CorpusStateStream.docSchema

  /** Layout version: v1 (r16, unmarked) had no doclens/lexstats and the
    * read re-aggregated df/dl from the full postings per query; v2
    * (early r17) lacked the positional tier, so a v2 dir would serve
    * phrase queries an empty index — hence the loud version bump. */
  private val FormatVersion = 3

  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("w", StringType),
    StructField("tf", LongType)))

  private val poslistsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("pos", IntegerType),
    StructField("w", StringType)))

  private val lexdocsSchema = StructType(Seq(StructField("doc_id", LongType)))

  private val doclensSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dl", LongType)))

  private val lexstatsSchema = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("n_dl_docs", LongType),
    StructField("sum_dl", LongType)))

  private def forgetPendingPath(stateDir: String) =
    new Path(s"$stateDir/forget_pending")

  /** Read-path guard: refuse while a [[forget]] is mid-window (some
    * tables swapped, others not — N/df/avgdl would disagree silently)
    * and require the v2 layout marker on a populated dir. */
  private def requireReadable(spark: SparkSession, stateDir: String): Unit = {
    val pend = forgetPendingPath(stateDir)
    require(!pend.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(pend),
      s"$pend exists: a lexical forget crashed between its table swaps — " +
      "run recoverForget (or re-run forget) to heal before reading; a " +
      "mid-window read would serve df/N/avgdl from inconsistent tables")
    CorpusStateStream.requireFormat(spark, stateDir, "lexical",
      FormatVersion, "lexdocs")
  }

  /** The persisted postings (doc_id, term, tf). */
  def postingsState(spark: SparkSession, stateDir: String): DataFrame = {
    requireReadable(spark, stateDir)
    rawPostings(spark, stateDir)
  }

  private def rawPostings(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/postings", postingsSchema)

  /** The persisted POSITIONAL postings (doc_id, pos, term) — the phrase
    * tier ([[phraseFromState]]). */
  def poslistsState(spark: SparkSession, stateDir: String): DataFrame = {
    requireReadable(spark, stateDir)
    rawPoslists(spark, stateDir)
  }

  private def rawPoslists(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/poslists", poslistsSchema)

  /** The persisted document registry (every delivered doc_id — BM25's
    * N, token-less documents included). */
  def lexdocsState(spark: SparkSession, stateDir: String): DataFrame = {
    requireReadable(spark, stateDir)
    rawLexdocs(spark, stateDir)
  }

  private def rawLexdocs(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/lexdocs", lexdocsSchema)

  /** The persisted per-document token counts (docs with ≥1 token). */
  def doclensState(spark: SparkSession, stateDir: String): DataFrame = {
    requireReadable(spark, stateDir)
    rawDoclens(spark, stateDir)
  }

  private def rawDoclens(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/doclens", doclensSchema)

  /** The maintained corpus-statistics counter, folded to one row:
    * (n_dl_docs, sum_dl) over every counted document — avgdl's inputs
    * without any corpus-proportional aggregate. */
  def lexstatsState(spark: SparkSession, stateDir: String): DataFrame = {
    requireReadable(spark, stateDir)
    rawLexstats(spark, stateDir)
      .agg(sum(col("n_dl_docs")).as("n_dl_docs"),
        sum(col("sum_dl")).as("sum_dl"))
  }

  private def rawLexstats(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/lexstats", lexstatsSchema)

  /** One micro-batch: tokenize once, append exactly the new documents'
    * postings, lengths, counter delta and registry rows. Idempotent
    * under replay (anti-joins for the keyed tables, a batch_id probe
    * for the counter); every crash window between the appends heals on
    * replay — see the object scaladoc's ordering argument. */
  def update(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    require(batchId >= 0, s"batchId $batchId: negative ids are reserved " +
      s"for folded snapshot rows (${CorpusStateStream.SnapshotBatchId})")
    val spark = batch.sparkSession
    CorpusStateStream.stampFormat(spark, stateDir, "lexical",
      FormatVersion, "lexdocs")
    val pend = forgetPendingPath(stateDir)
    require(!pend.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(pend),
      s"$pend exists: heal the crashed forget (recoverForget) before " +
      "appending — a mid-window append could land in a table about to swap")
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    // ONE positional tokenize pass feeds the positional-tier append,
    // the tf-postings append AND the new docs' length/counter
    // derivations — the two index tiers derive from the same tokens by
    // construction
    val ptok = graft.operators.Similarity.posTokens(docs).localCheckpoint()
    val posts = graft.operators.Similarity.postingsFromPosTokens(ptok)
      .localCheckpoint()
    ptok.select(col("doc_id"), col("pos"), col("w"))
      .join(rawPoslists(spark, stateDir).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$stateDir/poslists")
    posts
      .join(rawPostings(spark, stateDir).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$stateDir/postings")
    // docs new to the REGISTRY: the one definition of "this batch's
    // contribution" for doclens, the counter, and the registry itself —
    // a doc another batch already delivered contributes to none of them
    val newDocs = docs.select(col("doc_id"))
      .join(rawLexdocs(spark, stateDir), Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val newDls = posts
      .join(newDocs.select(col("doc_id").as("nd_id")),
        col("doc_id") === col("nd_id"), "left_semi")
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    // own anti-join guard: a crash after this append but before the
    // counter row replays the batch with newDocs still = the full batch
    // (the registry is written LAST), and without the guard the lengths
    // would double
    newDls
      .join(rawDoclens(spark, stateDir), Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$stateDir/doclens")
    val statsSeen = rawLexstats(spark, stateDir)
      .filter(col("batch_id") === batchId).limit(1).count() > 0
    if (!statsSeen) {
      newDls
        .agg(count(lit(1)).as("n_dl_docs"), sum(col("dl")).as("sum_dl"))
        .filter(col("n_dl_docs") > 0)
        .select(lit(batchId).as("batch_id"), col("n_dl_docs"), col("sum_dl"))
        .write.mode("append").parquet(s"$stateDir/lexstats")
    }
    newDocs.write.mode("append").parquet(s"$stateDir/lexdocs")
  }

  /** Fold the per-batch counter rows to ONE snapshot row — the LSM
    * merge bounding `lexstats/` to a single row however many batches
    * arrive (without it the table grows one 24-byte row per batch and
    * the avgdl fold pays |batches|). Safe against replays WITHOUT the
    * per-batch rows: a completed batch's replay derives its delta from
    * the docs new to the REGISTRY — empty once lexdocs holds them — so
    * the batch_id probe is only a fast path, never the idempotence
    * record (the [[forget]] snapshot relies on the same property).
    * Run offline, stream stopped (the compaction contract). Returns
    * (rows before, rows after). */
  def foldLexstats(spark: SparkSession, stateDir: String): (Long, Long) = {
    requireReadable(spark, stateDir)
    val before = rawLexstats(spark, stateDir).count()
    val snap = rawLexstats(spark, stateDir)
      .agg(coalesce(sum(col("n_dl_docs")), lit(0L)).as("n_dl_docs"),
        coalesce(sum(col("sum_dl")), lit(0L)).as("sum_dl"))
      .select(lit(CorpusStateStream.SnapshotBatchId).as("batch_id"),
        col("n_dl_docs"), col("sum_dl"))
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/lexstats")(t =>
      snap.write.mode("overwrite").parquet(t))
    (before, 1L)
  }

  /** q215's BM25 page served FROM the maintained index, query-bounded:
    * no tokenize pass, no corpus-proportional aggregate — postings read
    * with doc_id/term pushdown, candidate lengths probed from
    * `doclens/`, N from the registry's footer-stats count, avgdl from
    * the one-row counter fold. The scorer is the batch operator's own
    * [[graft.operators.Similarity.bm25FromPostings]]. */
  def bm25FromState(spark: SparkSession, stateDir: String,
      queryIds: Seq[Long], k: Int = 10): DataFrame = {
    requireReadable(spark, stateDir)
    val avgdlRow = rawLexstats(spark, stateDir)
      .agg((sum(col("sum_dl")).cast("double") /
        sum(col("n_dl_docs")).cast("double")).as("avgdl"))
    graft.operators.Similarity.bm25FromPostings(
      rawPostings(spark, stateDir),
      rawDoclens(spark, stateDir),
      rawLexdocs(spark, stateDir).agg(count(lit(1)).as("n")),
      avgdlRow, queryIds, k)
  }

  /** q222's phrase page served FROM the maintained POSITIONAL postings,
    * query-bounded: no tokenize pass — the query phrases read under
    * doc_id + pos pushdown (≤3 rows per query), their bounded term set
    * restricts the vote stream by isin pushdown, and the start-position
    * intersection aggregates only phrase-term hits. The engine is the
    * batch operator's own
    * [[graft.operators.Similarity.phraseFromPositions]]. */
  def phraseFromState(spark: SparkSession, stateDir: String,
      queryIds: Seq[Long], k: Int = 10): DataFrame = {
    requireReadable(spark, stateDir)
    graft.operators.Similarity.phraseFromPositions(
      rawPoslists(spark, stateDir).select(col("doc_id"), col("pos"), col("w")),
      queryIds, k)
  }

  /** q225's NEAR page served FROM the maintained positional postings,
    * query-bounded: the anchor pairs derive from the query ids'
    * persisted positions (doc_id pushdown), their ≤2-term-per-query
    * set restricts both position streams by term-isin pushdown, and
    * the ±window vote expansion is a fixed constant factor. The engine
    * is the batch operator's own
    * [[graft.operators.Similarity.proximityFromPositions]]. */
  def proximityFromState(spark: SparkSession, stateDir: String,
      queryIds: Seq[Long], window: Int = 3, k: Int = 10): DataFrame = {
    requireReadable(spark, stateDir)
    graft.operators.Similarity.proximityFromPositions(
      rawPoslists(spark, stateDir).select(col("doc_id"), col("pos"), col("w")),
      queryIds, window, k)
  }

  /** Index HEALTH stats — the observability read an operator checks
    * before and after maintenance (the q139 IVF-list-stats pattern for
    * the lexical family): registry size, distinct terms, postings
    * rows, positional rows, netted token mass and the served avgdl,
    * all from state aggregates — the corpus is never rescanned, so the
    * health check is as cheap as the reads it guards. */
  def indexStats(spark: SparkSession, stateDir: String): DataFrame = {
    requireReadable(spark, stateDir)
    val nDocs = rawLexdocs(spark, stateDir).agg(count(lit(1)).as("n_docs"))
    val p = rawPostings(spark, stateDir)
      .agg(count(lit(1)).as("n_postings"),
        countDistinct(col("w")).as("n_terms"))
    val pl = rawPoslists(spark, stateDir)
      .agg(count(lit(1)).as("n_positions"))
    val st = rawLexstats(spark, stateDir)
      .agg(sum(col("sum_dl")).as("sum_dl"),
        (sum(col("sum_dl")).cast("double") /
          sum(col("n_dl_docs")).cast("double")).as("avgdl"))
    nDocs.crossJoin(p).crossJoin(pl).crossJoin(st)
      .select(col("n_docs"), col("n_terms"), col("n_postings"),
        col("n_positions"), col("sum_dl"), col("avgdl"))
  }

  /** q234's RM3 expanded retrieval served FROM the maintained index:
    * all three stages (feedback page, term harvest, expanded re-score)
    * read the persisted postings through the batch operator's own
    * [[graft.operators.Similarity.rm3FromFrames]] pipeline — each scan
    * pushdown-restricted, avgdl from the counter, N from the registry:
    * the feedback loop with no corpus-proportional work anywhere. */
  def rm3FromState(spark: SparkSession, stateDir: String,
      queryIds: Seq[Long], fbK: Int = 3, expM: Int = 5,
      k: Int = 10): DataFrame = {
    requireReadable(spark, stateDir)
    val avgdlRow = rawLexstats(spark, stateDir)
      .agg((sum(col("sum_dl")).cast("double") /
        sum(col("n_dl_docs")).cast("double")).as("avgdl"))
    graft.operators.Similarity.rm3FromFrames(
      rawPostings(spark, stateDir),
      rawDoclens(spark, stateDir),
      rawLexdocs(spark, stateDir).agg(count(lit(1)).as("n")),
      avgdlRow, queryIds, fbK, expM, k)
  }

  /** q229's densest-passage page served FROM the maintained positional
    * postings, query-bounded: the query-term table reads the query ids'
    * leading positions under doc_id + pos pushdown, its bounded
    * distinct-term set restricts the hit stream by term-isin pushdown,
    * and the vote expansion is the fixed width factor. The engine is
    * the batch operator's own
    * [[graft.operators.Similarity.passageFromPositions]]. */
  def passageFromState(spark: SparkSession, stateDir: String,
      queryIds: Seq[Long], width: Int = 8, k: Int = 10): DataFrame = {
    requireReadable(spark, stateDir)
    graft.operators.Similarity.passageFromPositions(
      rawPoslists(spark, stateDir).select(col("doc_id"), col("pos"), col("w")),
      queryIds, width, k)
  }

  /** Right-to-be-forgotten — the keyed-1:1 complete-erasure class
    * ([[LshStateStream.forget]]'s contract) under a staged pending
    * marker: the tombstone set persists to `forget_pending/` BEFORE the
    * first swap and clears after the last, reads refuse mid-window, and
    * [[recoverForget]] replays the idempotent body from the stored set
    * after any crash. postings/poslists/lexdocs/doclens anti-join the
    * tombstones out under the two-rename swap; lexstats rewrites to one snapshot
    * row recomputed from the surviving postings (exact integers), so
    * df, N and avgdl all serve the survivors-only values (q218's gate).
    * Re-running with the same tombstones is a no-op. Run offline. */
  def forget(spark: SparkSession, stateDir: String,
      tombstones: DataFrame): Unit =
    forgetImpl(spark, stateDir, tombstones, crashAfterSwap = Int.MaxValue)

  /** Test seam: throw after the n-th table swap (1 = postings, 2 =
    * poslists, 3 = doclens, 4 = lexstats, 5 = lexdocs; 0 = pending
    * staged, nothing swapped) so the spec can prove every crash window
    * refuses reads and heals under [[recoverForget]]. */
  private[streaming] def forgetImpl(spark: SparkSession, stateDir: String,
      tombstones: DataFrame, crashAfterSwap: Int): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val pend = forgetPendingPath(stateDir)
    val fs = pend.getFileSystem(hconf)
    // heal any prior crashed forget first — its stored tombstones, then
    // ours (two deletion requests compose; each body is idempotent)
    recoverForget(spark, stateDir)
    CorpusStateStream.requireFormat(spark, stateDir, "lexical",
      FormatVersion, "lexdocs")
    // stage the pending marker atomically: tombstones written to a .tmp
    // dir, one rename — a half-written marker can never be mistaken for
    // a healable window
    val tmp = new Path(s"$stateDir/forget_pending.tmp")
    fs.delete(tmp, true)
    tombstones.select(col("doc_id")).distinct()
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/tombs")
    require(fs.rename(tmp, pend), s"could not stage the forget to $pend")
    if (crashAfterSwap == 0)
      throw new IllegalStateException("injected crash after staging")
    applyPendingForget(spark, stateDir, crashAfterSwap)
  }

  /** The idempotent forget body: anti-join every keyed table against
    * the PENDING dir's tombstones, snapshot the counter from the
    * surviving lengths, swap all five, clear the marker. Safe from any
    * crash point — an already-swapped table anti-joins to itself. */
  private def applyPendingForget(spark: SparkSession, stateDir: String,
      crashAfterSwap: Int = Int.MaxValue): Unit = {
    def crash(step: Int): Unit =
      if (crashAfterSwap == step)
        throw new IllegalStateException(s"injected crash after swap $step")
    val pend = forgetPendingPath(stateDir)
    val fs = pend.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = spark.read.schema(lexdocsSchema).parquet(s"$pend/tombs")
      .localCheckpoint(true)
    // every replacement computes (and materializes) BEFORE its swap;
    // raw reads — the public readers refuse while the marker exists
    val p = rawPostings(spark, stateDir)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/postings")(t =>
      p.write.mode("overwrite").parquet(t))
    crash(1)
    val pl = rawPoslists(spark, stateDir)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/poslists")(t =>
      pl.write.mode("overwrite").parquet(t))
    crash(2)
    val dl = rawDoclens(spark, stateDir)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/doclens")(t =>
      dl.write.mode("overwrite").parquet(t))
    crash(3)
    // the counter snapshot derives from the SURVIVING doclens — exact
    // integers, so post-forget avgdl is the survivors' value to the bit
    val statsSnap = dl
      .agg(count(lit(1)).as("n_dl_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .select(lit(CorpusStateStream.SnapshotBatchId).as("batch_id"),
        col("n_dl_docs"), col("sum_dl"))
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/lexstats")(t =>
      statsSnap.write.mode("overwrite").parquet(t))
    crash(4)
    val d = rawLexdocs(spark, stateDir)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/lexdocs")(t =>
      d.write.mode("overwrite").parquet(t))
    crash(5)
    fs.delete(pend, true)
  }

  /** Crash recovery for [[forget]]: a staged pending dir replays the
    * idempotent body from its stored tombstones; a half-staged `.tmp`
    * is discarded; a table dir left mid-swap (dangling `.old`) promotes
    * back first. Runs at the start of every forget; exposed for
    * operators healing a refused read without deleting anything new. */
  def recoverForget(spark: SparkSession, stateDir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val pend = forgetPendingPath(stateDir)
    val fs = pend.getFileSystem(hconf)
    fs.delete(new Path(s"$stateDir/forget_pending.tmp"), true)
    // promote any dangling .old left by a swap that died between its
    // two renames — the body's raw reads would otherwise refuse
    Seq("postings", "poslists", "doclens", "lexstats", "lexdocs").foreach { t =>
      val dir = new Path(s"$stateDir/$t")
      val old = new Path(s"$stateDir/$t.old")
      if (!fs.exists(dir) && fs.exists(old))
        require(fs.rename(old, dir), s"could not recover $old to $dir")
    }
    if (fs.exists(pend)) applyPendingForget(spark, stateDir)
  }

  /** Start the maintenance stream over arriving document parquet files
    * (the shared CorpusStateStream starter). */
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
