package graft.streaming

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
  * State layout under `stateDir`:
  *   - `postings/` — (doc_id, w, tf), keyed by the RAW lowercased
  *     token deliberately (not the family's usual 64-bit hash): a
  *     keyword index's terms ARE the searchable surface, not sensitive
  *     derived state, and the raw key keeps the served page
  *     bit-comparable cross-engine with no hash-domain caveat (the
  *     boilerplate blacklist's reviewability rationale);
  *   - `lexdocs/` — (doc_id): every delivered document, token-less
  *     ones included. BM25's N counts ALL documents (a token-less doc
  *     shifts idf but never scores), so N cannot derive from postings.
  *
  * Both tables are keyed 1:1 by doc_id with no trained model attached —
  * the [[LshStateStream]] deletion class: [[forget]] is COMPLETE
  * erasure by broadcast anti-join + two-rename swap on both tables, and
  * df/avgdl/N fall out of the survivors at read time with zero netting
  * (they are derived, never materialized). After a forget, a deleted
  * document can neither match a query term (no postings) nor shift any
  * score (no df/N contribution) — the property q218 proves under the
  * hash gate against a full survivor recompute.
  *
  * Exactly-once: the corpus stream's contract — each table appends only
  * rows whose doc_id its OWN anti-join hasn't seen (two independent
  * idempotent appends; a crash between them replays the batch and only
  * the missing table heals — the [[CorpusStateStream.update]] pattern).
  *
  * Scale: per batch, one |batch| tokenize into a map-side-combined
  * (doc, term) aggregate + two pushdown anti-joins on the 8-byte key.
  * A query reads postings matching its bounded term set (an index scan
  * under predicate pushdown — at deployment scale, bucket `postings/`
  * by w so the probe is partition-pruned), the |vocab|-keyed df
  * aggregate, and two 1-row stats. */
object LexicalStateStream {

  val docSchema: StructType = CorpusStateStream.docSchema

  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("w", StringType),
    StructField("tf", LongType)))

  private val lexdocsSchema = StructType(Seq(StructField("doc_id", LongType)))

  /** The persisted postings (doc_id, term, tf). */
  def postingsState(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/postings", postingsSchema)

  /** The persisted document registry (every delivered doc_id — BM25's
    * N, token-less documents included). */
  def lexdocsState(spark: SparkSession, stateDir: String): DataFrame =
    CorpusStateStream.stateDf(spark, s"$stateDir/lexdocs", lexdocsSchema)

  /** One micro-batch: tokenize once, append exactly the new documents'
    * postings and registry rows. Idempotent under replay (each table's
    * own anti-join); a crash between the two appends heals on replay. */
  def update(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").localCheckpoint()
    graft.operators.Similarity.bm25Postings(docs)
      .join(postingsState(spark, stateDir).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$stateDir/postings")
    docs.select(col("doc_id"))
      .join(lexdocsState(spark, stateDir), Seq("doc_id"), "left_anti")
      .write.mode("append").parquet(s"$stateDir/lexdocs")
  }

  /** q215's BM25 page served FROM the maintained index: no tokenize
    * pass — the postings are read with pushdown, N from the registry,
    * and the scorer is the batch operator's own
    * [[graft.operators.Similarity.bm25FromPostings]]. */
  def bm25FromState(spark: SparkSession, stateDir: String,
      queryIds: Seq[Long], k: Int = 10): DataFrame =
    graft.operators.Similarity.bm25FromPostings(
      postingsState(spark, stateDir),
      lexdocsState(spark, stateDir).agg(count(lit(1)).as("n")),
      queryIds, k)

  /** Right-to-be-forgotten — the keyed-1:1 complete-erasure class
    * ([[LshStateStream.forget]]'s contract): tombstoned doc_ids
    * anti-join out of both tables under the two-rename swap; df, N and
    * avgdl are DERIVED at read time, so every score over the survivors
    * is automatically the survivors-only recompute (q218's gate).
    * Re-running with the same tombstones is a no-op. Run offline. */
  def forget(spark: SparkSession, stateDir: String,
      tombstones: DataFrame): Unit = {
    val tomb = tombstones.select(col("doc_id")).distinct()
      .localCheckpoint(true)
    val p = postingsState(spark, stateDir)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/postings")(tmp =>
      p.write.mode("overwrite").parquet(tmp))
    val d = lexdocsState(spark, stateDir)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    CorpusStateStream.swapState(spark, s"$stateDir/lexdocs")(tmp =>
      d.write.mode("overwrite").parquet(tmp))
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
