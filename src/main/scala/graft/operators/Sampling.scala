package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deterministic sampling / dataset splitting. A training pipeline must
  * produce the SAME train/val/test membership on every run, on any
  * cluster size, with no stored split table — so membership is a pure
  * function of a stable key (hash-bucketing), never `rand()` (which is
  * per-task-seed dependent) and never a sampled row set that has to be
  * persisted and joined at 100 TB.
  *
  * `md5` rather than a cheaper hash because the oracle (and any other
  * engine a user checks against) computes the identical bytes — split
  * parity across engines is the whole point of a deterministic split.
  */
object Sampling {

  /** 256-way stable bucket: first two hex chars of md5(key). Lowercase
    * hex compares lexicographically = numerically, in every engine. */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 2)

  /** 80/10/10 split by bucket range: 0x00-0xcb train (204/256),
    * 0xcc-0xe5 val (26/256), 0xe6-0xff test (26/256). */
  def splitOf(key: Column): Column = {
    val b = hashBucket(key)
    when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
  }

  /** The deterministic right-to-be-forgotten tombstone convention the
    * q199/q200/q201 served-after-deletion reads share across engines:
    * ~1/16 of keys (first md5 hex = [[TombstoneHex]]), the q153
    * md5-bucket family. One definition so an engine-side forget and its
    * oracle's survivor predicate can never disagree on WHO is deleted. */
  val TombstoneHex = "a"

  def tombstoned(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1) === TombstoneHex

  /** md5-derived uniform in (0,1): first 8 hex chars + 0.5, over 2^32.
    * The engine-portable stand-in for rand() — identical on every run,
    * cluster size, and engine (q87's key, q95's acceptance test). */
  def mdUniform(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(0.5d)) / lit(4294967296.0d)

  /** Whitespace token count — ONE definition shared by the weight
    * derivation and the acceptance stage (and mirrored by the oracle's
    * `len(string_split(...))`): the q94/q95 hash-parity contract depends
    * on every site counting tokens identically. */
  def nTokens(text: Column): Column = size(split(text, " ")).cast("long")

  /** Temperature-tau=0.5 mixture sampler (q124): per-source weight ∝
    * sqrt(n_docs) (IEEE sqrt, floor-quantized to integer micro-weights so
    * the normalizer is an exact integer sum), integer-floor allocation of
    * a fixed doc budget, then deterministic per-source draw by md5 rank.
    * Returns one ledger row per source. */
  def temperatureMixture(docsIn: org.apache.spark.sql.DataFrame,
      budget: Int): org.apache.spark.sql.DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tok"))
    val q = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs").cast("bigint").as("n_docs"),
        floor(sqrt(col("n_docs").cast("double")) * lit(1e6d)).cast("bigint")
          .as("weight_micro"))
    val tot = q.agg(sum(col("weight_micro")).as("wt"))
    val tgt = q.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("weight_micro"),
        expr(s"($budget * weight_micro) div wt").cast("bigint").as("target_n"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val smp = docs.withColumn("rn", row_number().over(w))
      .join(broadcast(tgt.select(col("source"), col("target_n"))), "source")
      .filter(col("rn") <= col("target_n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("sampled_docs"),
        sum(col("n_tok")).cast("bigint").as("sampled_tokens"))
    tgt.join(smp, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("weight_micro"), col("target_n"),
        coalesce(col("sampled_docs"), lit(0L)).as("sampled_docs"),
        coalesce(col("sampled_tokens"), lit(0L)).as("sampled_tokens"))
      .orderBy(col("source"))
  }

  /** Per-source mixing weights toward a uniform target share (q94):
    * weight ∝ target/actual token share, normalized so the scarcest
    * source keeps weight 1. Returns one row per source with
    * (source, n_docs, tokens, actual_share, weight). */
  def mixtureWeights(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tok = docs
      .select(col("source"), nTokens(col("text")).as("n_tokens"))
    val perSrc = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
    val tot = perSrc.agg(sum(col("tokens")).as("t"), count(lit(1)).as("n_sources"))
    val ratio = perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tokens"),
        (col("tokens").cast("double") / col("t").cast("double")).as("actual_share"),
        ((lit(1.0d) / col("n_sources"))
          / (col("tokens").cast("double") / col("t").cast("double"))).as("r"))
    val wAll = Window.partitionBy()
    ratio.select(col("source"), col("n_docs"), col("tokens"), col("actual_share"),
      (col("r") / max(col("r")).over(wAll)).as("weight"))
  }

  /** The q94/q95 shared oracle CTEs: per-source tokens → normalized
    * mixing weights, ANSI twin of [[mixtureWeights]]. */
  private val MixtureCte: String =
    """WITH tok AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |per_src AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS tokens
      |  FROM tok GROUP BY source),
      |tot AS (
      |  SELECT CAST(sum(tokens) AS BIGINT) AS t, count(*) AS n_sources
      |  FROM per_src),
      |ratio AS (
      |  SELECT source, n_docs, tokens,
      |    CAST(tokens AS DOUBLE) / CAST(t AS DOUBLE) AS actual_share,
      |    (CAST(1.0 AS DOUBLE) / n_sources)
      |      / (CAST(tokens AS DOUBLE) / CAST(t AS DOUBLE)) AS r
      |  FROM per_src, tot),
      |wts AS (
      |  SELECT source, n_docs, tokens, actual_share,
      |    r / max(r) OVER () AS weight
      |  FROM ratio)""".stripMargin

  /** DSIR-style importance scoring (q111): rank every raw-pool doc (the
    * non-`target` sources) by avg per-token ln p_target(bucket) −
    * ln p_raw(bucket) under 256-bucket hashed-token LMs (add-1 smoothed),
    * returning the top `k`. Each ln term is floor-quantized to integer
    * micro-nats per BUCKET, so all distributed sums are exact integers
    * and the ranking is engine-portable (the q103 determinism playbook).
    * The top-k is a distributed TakeOrdered first, window-ranked after
    * (q83 pattern) — no global window over the corpus. */
  def dsirImportanceTop(docs: org.apache.spark.sql.DataFrame, target: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    val tok = docs.select(col("doc_id"), col("source"),
      explode(wsTokens(lower(col("text")))).as("w"))
    // materialized once (q76's signature-table pattern): BOTH the bucket
    // LM derivation and the scoring join read this table, and without the
    // checkpoint each consumer re-tokenizes and re-hashes the corpus —
    // the |docs|x(<=256) count table is exactly what a production
    // pipeline persists between the two passes.
    val dbc = tok
      .groupBy(col("doc_id"), col("source"), hashBucket(col("w")).as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val bc = dbc.groupBy(col("b")).agg(
      sum(when(col("source") === target, col("c")).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= target, col("c")).otherwise(0L)).as("cr"))
    val tot = bc.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val wt = bc.crossJoin(broadcast(tot)).select(col("b"),
      (floor(log((col("ct") + 1).cast("double") / (col("tt") + 256).cast("double")) * 1e6).cast("bigint")
        - floor(log((col("cr") + 1).cast("double") / (col("tr") + 256).cast("double")) * 1e6).cast("bigint"))
        .as("lnr"))
    val scored = dbc.filter(col("source") =!= target)
      .join(broadcast(wt), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("lnr")).as("slnr"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        ((col("slnr") * lit(1e-6d)) / col("n_tokens")).as("avg_logratio"))
    scored.orderBy(col("avg_logratio").desc, col("doc_id")).limit(k)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("avg_logratio").desc, col("doc_id"))))
      .orderBy(col("rn"))
  }

  /** q164: the epoch plan — per source, how many PASSES over its
    * capacity a token budget implies under temperature-τ=0.5 mixture
    * weights (weight ∝ √capacity, the q124 flattening applied to token
    * mass). target_tokens is the integer grant budget·w_i/Σw; epochs =
    * target/capacity is the repeat factor a data loader must schedule —
    * epochs > 1 IS upsampling (the source repeats within one budget
    * epoch), the regime q160's waterfill refuses by construction (it
    * caps at capacity) and real mixtures routinely enter for scarce
    * high-quality sources. The product budget·weight runs in
    * decimal(38,0) unconditionally (the q147 lesson: an int64 product
    * wraps silently at planetary budgets while the oracle's HUGEINT
    * does not). Scale: one map-side-combined |sources| aggregate; all
    * windows/joins on that bounded frame. */
  def epochPlan(docs: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame =
    epochPlanFromCaps(
      docs.select(col("source"), nTokens(col("text")).as("nt"))
        .groupBy(col("source"))
        .agg(sum(col("nt")).cast("bigint").as("capacity")),
      budget)

  /** The τ=0.5 planner body over a PREBUILT (source, capacity) frame —
    * [[epochPlan]] aggregates raw documents into it; the dedup-aware
    * replan (q170) feeds it capacities measured on UNIQUE content
    * instead. One definition of the weight quantization, the
    * decimal(38,0) grant arithmetic, and the epoch division, so the two
    * plans a mixture designer compares can never drift in anything but
    * their capacity input. */
  def epochPlanFromCaps(caps: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    val w = caps.select(col("source"), col("capacity"),
      floor(sqrt(col("capacity").cast("double")) * lit(1e6d)).cast("bigint")
        .as("weight_micro"))
    val tot = w.agg(sum(col("weight_micro")).cast("bigint").as("wt"))
    w.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * weight_micro) div wt AS BIGINT)"))
      .select(col("source"), col("capacity"), col("weight_micro"),
        col("target_tokens"),
        // guarded: ANSI mode throws on double division by zero, and the
        // q170 replan leg legitimately feeds capacity-0 rows (a fully
        // duplicated source); q164's raw capacities are always positive,
        // so the guard is inert there
        when(col("capacity") > 0,
          col("target_tokens").cast("double") / col("capacity").cast("double"))
          .as("epochs"),
        (col("target_tokens") > col("capacity")).as("upsampled"))
      .orderBy(col("source"))
  }

  /** q173: soft-dedup sampling — keep each document with probability
    * 1/|its exact-dup cluster|, so every duplicate cluster contributes
    * ONE document in expectation without a keeper election. This is
    * the dedup-by-reweighting alternative to q32's hard keeper: where
    * the keeper rule always keeps min doc_id (biasing survivors toward
    * old crawls), the soft sampler keeps an unbiased representative —
    * the standard trick when duplicates carry metadata worth mixing
    * over (crawl date, source). The decision is DETERMINISTIC and
    * engine-portable: u = the first 12 hex chars of md5(doc_id) read as
    * an integer in [0, 2^48), keep iff u ≤ (2^48 − 1) div n_copies —
    * pure integer arithmetic, no rand(), reproducible on any cluster
    * (the q61 split-function convention applied to inclusion
    * sampling). The div form is exactly u · n < 2^48 for integer u
    * but cannot overflow: the product form wraps int64 once a cluster
    * exceeds 2^15 copies (boilerplate pages at web scale do), silently
    * flipping keep decisions; the quotient is always ≤ 2^48 − 1.
    * Cluster sizes come from the SAME fingerprint definition as
    * q32/q168 ([[graft.functions.TextFunctions.fingerprint]] via
    * [[Dedup.exactDedup]]). Report is per cluster-size: clusters,
    * docs, kept, realized kept_rate vs the 1/n expectation; the n=1
    * row is the exactness anchor (u < 2^48 always — kept_rate 1.0).
    *
    * Scale: one fingerprint projection, one md5-key cluster-size
    * aggregate (map-side combined), one fp-key join back, one
    * bounded-key (|distinct sizes|) aggregate — all linear, keys are
    * 32-char md5s and 8-byte ints; no expression can exceed 2^48. */
  def softDedupSample(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // ONE corpus scan: cluster sizes derive from the same fingerprint
    // projection the membership test reads (r17 — exactDedup as a
    // separate call re-scanned and re-normalized every document; the
    // checkpointed frame is doc_id + 32-char fp, the posting a
    // production soft-dedup materializes anyway)
    val fp = docs.select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .localCheckpoint(true)
    val clusters = Dedup.exactDedupFromFp(fp).select(col("fp"), col("n_copies"))
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long")
    val tagged = fp.join(clusters, Seq("fp"))
      .select(col("fp"), col("n_copies"),
        (u <= expr(s"CAST(${(1L << 48) - 1} AS BIGINT) div n_copies"))
          .as("kept"))
    tagged.groupBy(col("n_copies").cast("bigint").as("n_copies"))
      .agg(countDistinct(col("fp")).cast("bigint").as("n_clusters"),
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("kept").cast("long")).cast("bigint").as("n_kept"))
      .select(col("n_copies"), col("n_clusters"), col("n_docs"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_docs").cast("double"))
          .as("kept_rate"),
        (lit(1.0d) / col("n_copies").cast("double")).as("expected_rate"))
      .orderBy(col("n_copies"))
  }

  /** q179: which corpus statistics can a block sample honestly
    * estimate? At 100 TB nobody profiles the full corpus first — they
    * profile a deterministic 1/16 sample (q123's md5-prefix convention)
    * and extrapolate. This query VALIDATES that recipe per statistic:
    * exact value, sample value, 16× extrapolation, and relative error,
    * for four metrics chosen to span the three sampling regimes:
    *   - n_docs / n_tokens: LINEAR — extrapolation is unbiased, the
    *     recipe works;
    *   - vocab_size: SUBLINEAR (Heaps' law — the sample already holds
    *     most of the vocabulary, so ×16 wildly overestimates);
    *   - dup_docs (docs in exact-dup clusters ≥ 2): SUPERLINEAR in the
    *     sampling sense — a pair survives only if BOTH members sample
    *     (p² = 1/256), so ×16 wildly underestimates.
    * The table is the checklist a profiling job consults before
    * trusting a sampled number — the two biased rows are the point,
    * not a defect (the q159 surfaced-degeneracy convention).
    *
    * Determinism: the sample is a pure function of doc_id (identical
    * md5 text both engines); every exact/sample/extrapolated value is
    * an exact integer; rel_err is one guarded IEEE division. Scale:
    * ONE corpus scan feeding three aggregates (count/sum pair, a
    * two-sided countDistinct over one exploded token stream, one
    * fingerprint-key aggregate carrying both the full and sample
    * counts) — the sample column rides the same pass, nothing is
    * scanned twice; in production the exact columns drop away and the
    * probe touches 1/16 of the data. */
  def sampleExtrapolation(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    val inS = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
    val base = docs.select(col("doc_id"), col("text"), inS.as("s"))
    def rows(src: org.apache.spark.sql.DataFrame)(
        triples: (String, Column, Column)*): org.apache.spark.sql.DataFrame =
      src.select(explode(array(triples.map { case (m, e, sm) =>
          struct(lit(m).as("metric"), e.cast("bigint").as("exact"),
            sm.cast("bigint").as("sample")) }: _*)).as("r"))
        .select(col("r.metric").as("metric"), col("r.exact").as("exact"),
          col("r.sample").as("sample"))
    val counts = base.select(col("s"), size(wsTokens(col("text"))).as("nt"))
      .agg(count(lit(1)).as("nd"), sum(when(col("s"), 1L).otherwise(0L)).as("nds"),
        sum(col("nt")).as("tk"),
        sum(when(col("s"), col("nt")).otherwise(0L)).as("tks"))
    val cRows = rows(counts)(
      ("n_docs", col("nd"), col("nds")),
      ("n_tokens", col("tk"), col("tks")))
    val vocab = base
      .select(col("s"), explode(wsTokens(lower(col("text")))).as("w"))
      .select(col("s"), xxhash64(col("w")).as("h"))
      .agg(countDistinct(col("h")).as("v"),
        countDistinct(when(col("s"), col("h"))).as("vs"))
    val vRows = rows(vocab)(("vocab_size", col("v"), col("vs")))
    val dup = base
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        col("s"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("na"), sum(when(col("s"), 1L).otherwise(0L)).as("ns"))
      .agg(coalesce(sum(when(col("na") >= 2, col("na")).otherwise(0L)), lit(0L))
          .as("d"),
        coalesce(sum(when(col("ns") >= 2, col("ns")).otherwise(0L)), lit(0L))
          .as("ds"))
    val dRows = rows(dup)(("dup_docs", col("d"), col("ds")))
    cRows.unionByName(vRows).unionByName(dRows)
      .select(col("metric"), col("exact"), col("sample"),
        (col("sample") * 16L).cast("bigint").as("extrapolated"),
        when(col("exact") > 0,
          (col("sample") * 16L - col("exact")).cast("double") /
            col("exact").cast("double")).as("rel_err"))
      .orderBy(col("metric"))
  }

  /** q170: the dedup × mixture interaction — the nominal τ=0.5 epoch
    * plan next to the plan REPLANNED on unique content, where unique
    * capacity keeps one document per exact content fingerprint (the
    * q32 keeper election: min doc_id per [[Dedup.exactDedup]]
    * fingerprint, cross-source). Planning a mixture on raw capacities
    * silently spends budget re-reading duplicated mass; this table
    * quantifies both failure modes at once: `epochs_on_unique` is what
    * the NOMINAL grant really does to unique content (the hidden
    * upsampling a loader executes when dedup runs after planning), and
    * `target_replanned`/`epochs_replanned` is the grant the designer
    * should have issued. Both legs run through [[epochPlanFromCaps]] —
    * one planner definition, capacities the only difference. A source
    * whose EVERY document loses the keeper election — the case this
    * replan exists to surface — stays in the table at
    * unique_capacity = 0 (grant 0, epoch ratios NULL), never silently
    * dropped.
    *
    * Determinism: capacities, keeper election, and grants are exact
    * integer/decimal arithmetic (the q164 decimal(38,0) convention);
    * the two epoch ratios are single IEEE divisions. Scale: one corpus
    * scan to token counts, one fingerprint aggregate (md5 keys,
    * map-side combined) + a doc_id semi-join for keepers, then
    * everything on |sources|-row frames. */
  def dedupAwareEpochPlan(docs: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    // ONE corpus scan: the keeper election's content fingerprint rides
    // the token-count projection (r17 — exactDedup as a separate call
    // re-scanned and re-normalized every document's text; the 32-char fp
    // column costs the checkpoint ~36 bytes/row, the second 100 TB text
    // pass it replaces costs a full corpus read)
    val tok = docs.select(col("doc_id"), col("source"),
        nTokens(col("text")).as("nt"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .localCheckpoint(true)
    val capsAll = tok.groupBy(col("source"))
      .agg(sum(col("nt")).cast("bigint").as("capacity"))
    val keepers = Dedup.exactDedupFromFp(tok.select(col("fp"), col("doc_id")))
      .select(col("keep_doc_id").as("doc_id"))
    // LEFT join from the full source list, coalescing to 0: a source
    // whose EVERY document loses the cross-source keeper election — the
    // most pathological case a dedup-aware replan exists to surface —
    // must appear as unique_capacity = 0, never silently vanish (an
    // inner join on the unique-side aggregate would drop it)
    val capsUnique = capsAll.select(col("source"))
      .join(tok.join(keepers, Seq("doc_id"), "left_semi")
          .groupBy(col("source"))
          .agg(sum(col("nt")).cast("bigint").as("ucap")),
        Seq("source"), "left")
      .select(col("source"), coalesce(col("ucap"), lit(0L)).as("capacity"))
    val nominal = epochPlanFromCaps(capsAll, budget)
      .select(col("source"), col("capacity"),
        col("target_tokens").as("target_nominal"),
        col("epochs").as("epochs_nominal"))
    val replanned = epochPlanFromCaps(capsUnique, budget)
      .select(col("source"), col("capacity").as("unique_capacity"),
        col("target_tokens").as("target_replanned"))
    nominal.join(replanned, Seq("source"))
      .select(col("source"), col("capacity"), col("unique_capacity"),
        (col("capacity") - col("unique_capacity")).as("dup_tokens"),
        col("target_nominal"), col("epochs_nominal"),
        when(col("unique_capacity") > 0,
          col("target_nominal").cast("double")
            / col("unique_capacity").cast("double")).as("epochs_on_unique"),
        col("target_replanned"),
        when(col("unique_capacity") > 0,
          col("target_replanned").cast("double")
            / col("unique_capacity").cast("double")).as("epochs_replanned"))
      .orderBy(col("source"))
  }

  /** q167: retrieval-corpus chunking with OVERLAP — the RAG/embedding
    * ingestion shape q145's packing deliberately is not: q145 tiles
    * disjoint training windows across a global token ledger; a
    * retrieval corpus instead cuts each document independently into
    * `windowTokens`-token chunks every `stride` tokens (overlap =
    * window − stride), so no boundary sentence is unembeddable. Chunks
    * start at multiples of the stride and emission stops with the
    * first chunk whose end reaches the document end (nchunks =
    * ceil((n−W)/S)+1, floored at 1 — the standard splitter rule; no
    * fully-contained tail chunks). Pure projection + bounded per-doc
    * explode (≈ n/S rows per doc): zero body shuffles, fuses with any
    * scan — the 100 TB shape for a chunker. All columns exact
    * integers. */
  def overlapChunks(docs: org.apache.spark.sql.DataFrame,
      windowTokens: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(stride > 0 && stride <= windowTokens,
      s"stride $stride must be in (0, windowTokens=$windowTokens]")
    val nchunks = when(col("nt") <= windowTokens, lit(1L))
      .otherwise(
        expr(s"((nt - $windowTokens + $stride - 1) div $stride) + 1"))
    docs.select(col("doc_id"), nTokens(col("text")).as("nt"))
      .withColumn("i", explode(sequence(lit(0L), nchunks - 1)))
      .select(col("doc_id"), col("i").cast("int").as("chunk_id"),
        (col("i") * stride).cast("bigint").as("tok_start"),
        least(col("i") * stride + windowTokens, col("nt")).cast("bigint")
          .as("tok_end"))
      .withColumn("n_tokens", col("tok_end") - col("tok_start"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** q145's chain over an arbitrary documents relation — `"documents"`
    * renders the historical q145/q187 SQL byte-equal; q207 passes the
    * tombstone-survivor subquery, because a repacked ledger must equal
    * the fresh pack over exactly the survivors in arrival order. */
  private def q145OracleSqlOver(docRel: String): String =
    s"""WITH tok AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM $docRel),
      |off AS (
      |  SELECT doc_id, n_tok,
      |    CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS tok_offset
      |  FROM tok)
      |SELECT doc_id, n_tok, tok_offset,
      |  CAST(tok_offset // 512 AS BIGINT) AS start_window,
      |  CAST((tok_offset + n_tok - 1) // 512 AS BIGINT) AS end_window,
      |  CAST((tok_offset + n_tok - 1) // 512 - tok_offset // 512 + 1
      |    AS BIGINT) AS n_windows,
      |  ((tok_offset + n_tok - 1) // 512 > tok_offset // 512) AS fragmented
      |FROM off ORDER BY doc_id""".stripMargin

  private val q145OracleSql: String = q145OracleSqlOver("documents")

  private def q207OracleSql: String = q145OracleSqlOver(
    "(SELECT * FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '" +
      TombstoneHex + "')")

  /** Build-once on-disk packing ledger for the state-served read (q187):
    * fold the corpus through the SAME micro-batch update the maintenance
    * stream runs (PackingStream.update — staged write, atomic-rename
    * commit, anti-join + ledger-high-water idempotence guards), in two
    * doc_id-RANGE waves so batch 1 continues from batch 0's high-water
    * mark (range waves, not the datasheet builder's parity waves: the
    * ledger's offsets are order-dependent, and range boundaries keep the
    * incremental concatenation order identical to q145's global doc_id
    * order — exactly how a production ingest arrives, in id-ordered
    * batches). Batch 1 is then REPLAYED so the commit-marker fast path
    * executes against real state, not just in specs. Memoized per
    * (session, corpus); protectNew = false — the durable product is the
    * on-disk ledger (the q180/q181 servedStateDir contract). */
  private def servedPackingStateDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"packstate|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_pack_state").toString)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // bounded one-row metadata action (parquet footer min/max) to pick
      // the wave boundary; any split respecting doc_id order would do
      val maxRow = docs.agg(max(col("doc_id"))).collect()(0)
      require(!maxRow.isNullAt(0),
        s"documents table at $d is empty — cannot build packing state")
      val mid = maxRow.getLong(0) / 2
      val wave0 = docs.filter(col("doc_id") <= mid)
      val wave1 = docs.filter(col("doc_id") > mid)
      graft.streaming.PackingStream.update(dir)(wave0, 0L)
      graft.streaming.PackingStream.update(dir)(wave1, 1L)
      // crash-replay of a committed batch: must be a no-op (the dest
      // file IS the commit marker) — exercised here so the driver's
      // q187 hash gate re-proves it cross-engine, not just in specs
      graft.streaming.PackingStream.update(dir)(wave1, 1L)
      dir
    }

  /** Build-once FORGOTTEN packing ledger for q207: its OWN two-range-wave
    * build (never the shared q187 ledger — the forget mutates in place),
    * then PackingStream.forget with the shared tombstone rule — the
    * bounded suffix repack — plus a replayed forget (no tombstoned doc
    * remains → no-op), so the hash gate re-proves repack idempotence
    * cross-engine. */
  private[operators] def servedForgottenPackingDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"packforget|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_packforget_state").toString)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val maxRow = docs.agg(max(col("doc_id"))).collect()(0)
      require(!maxRow.isNullAt(0),
        s"documents table at $d is empty — cannot build packing state")
      val mid = maxRow.getLong(0) / 2
      graft.streaming.PackingStream.update(dir)(
        docs.filter(col("doc_id") <= mid), 0L)
      graft.streaming.PackingStream.update(dir)(
        docs.filter(col("doc_id") > mid), 1L)
      val tomb = docs.select(col("doc_id"))
        .filter(Sampling.tombstoned(col("doc_id")))
      graft.streaming.PackingStream.forget(s, dir, tomb)
      graft.streaming.PackingStream.forget(s, dir, tomb) // replay no-op
      dir
    }

  val queries: Seq[Q] = Seq(

    Q("q61_hash_split",
      """WITH b AS (
        |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |              ELSE 'test' END AS split, doc_id, n_chars
        |  FROM documents)
        |SELECT split, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM b GROUP BY split ORDER BY split""".stripMargin,
      "Deterministic train/val/test split: membership is md5(doc_id) bucketed 80/10/10 — reproducible on any run/cluster/engine, no rand(), no persisted split table to join. Stateless Project + one aggregation.") {
      (s, d) =>
        Tables.documents(s, d)
          .select(Sampling.splitOf(col("doc_id")).as("split"),
            col("doc_id"), col("n_chars"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("min_doc_id"),
            max(col("doc_id")).as("max_doc_id"))
          .orderBy(col("split"))
    },

    Q("q70_balanced_sample",
      """SELECT source, doc_id, CAST(rn AS INT) AS sample_rank FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 5
        |ORDER BY source, sample_rank""".stripMargin,
      "Balanced per-source sampling via a typed Aggregator (functions.BottomKIds): bottom-5-by-md5 per group is a uniform, reproducible, MERGEABLE sample — each map task ships at most k elements per group, unlike rand() sampling (not reproducible) or global top-k (not per-group). The oracle formulates the same sample as a window rank.") {
      (s, d) =>
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"),
            md5(col("doc_id").cast("string")).as("h"), col("doc_id"))
          .as[(String, String, Long)]
          .groupByKey(_._1)
          .agg(new graft.functions.BottomKIds(5).toColumn)
          .flatMap { case (source, ids) =>
            ids.zipWithIndex.map { case (id, i) => (source, id, i + 1) }
          }
          .toDF("source", "doc_id", "sample_rank")
          .orderBy(col("source"), col("sample_rank"))
    },

    Q("q87_weighted_sample",
      """SELECT source, doc_id, CAST(rn AS INT) AS sample_rank, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
        |                  / 4294967296.0) / n_chars DESC, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 5
        |ORDER BY source, sample_rank""".stripMargin,
      "Deterministic WEIGHTED sampling without replacement (Efraimidis-Spirtsas A-ES): per source, the 5 docs with the largest u^(1/w) — ranked equivalently by ln(u)/w — where w = n_chars and u is an md5-derived uniform in (0,1), so longer documents are proportionally likelier yet membership is a pure function of the data: reproducible across runs, cluster sizes, and engines, unlike rand()-weighted sampling. Top-k-per-group by a computed key — the same mergeable bounded-heap shape as q70/q67, never a global sort. The +0.5 offset keeps u strictly positive (ln defined); key ordering is ulp-robust because distinct md5s give keys separated far beyond 1-ulp libm divergence.") {
      (s, d) =>
        val w = Window.partitionBy(col("source"))
          .orderBy((log(mdUniform(col("doc_id"))) / col("n_chars")).desc, col("doc_id"))
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("sample_rank", row_number().over(w))
          .filter(col("sample_rank") <= 5)
          .select(col("source"), col("doc_id"), col("sample_rank"), col("n_chars"))
          .orderBy(col("source"), col("sample_rank"))
    },

    Q("q94_mixture_weights",
      MixtureCte + """
        |SELECT source, n_docs, tokens, actual_share, weight,
        |  CAST(tokens AS DOUBLE) * weight AS expected_tokens
        |FROM wts ORDER BY source""".stripMargin,
      "Data-mixing reweighting — the sampling weights that move a corpus toward a TARGET mixture (uniform across sources here): weight_s is proportional to target_share/actual_share, normalized so the hungriest source keeps weight 1 (without-replacement sampling cannot exceed 1); expected_tokens shows the post-sampling mix. Every value is derived from exact integer token counts through IEEE divisions with identical expression shape on both engines, so even the float weights hash-match. Scale: token counting is one map-side-combined shuffle; everything after runs on the |sources|-row frame. The per-doc acceptance test this feeds is q95.") {
      (s, d) =>
        mixtureWeights(Tables.documents(s, d))
          .withColumn("expected_tokens", col("tokens").cast("double") * col("weight"))
          .orderBy(col("source"))
    },

    Q("q95_mixture_sample",
      MixtureCte + """,
        |acc AS (
        |  SELECT t.source, t.n_tokens, w.weight,
        |    CASE WHEN (CAST('0x' || substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
        |              / 4294967296.0 < w.weight
        |         THEN 1 ELSE 0 END AS accepted
        |  FROM tok t JOIN wts w ON t.source = w.source),
        |agg AS (
        |  SELECT source, weight, count(*) AS n_docs,
        |    CAST(sum(accepted) AS BIGINT) AS n_accepted,
        |    CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |    CAST(sum(CASE WHEN accepted = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS accepted_tokens
        |  FROM acc GROUP BY source, weight),
        |tacc AS (SELECT CAST(sum(accepted_tokens) AS BIGINT) AS ta FROM agg)
        |SELECT source, n_docs, n_accepted, tokens, accepted_tokens, weight,
        |  CAST(accepted_tokens AS DOUBLE) / CAST(ta AS DOUBLE) AS realized_share
        |FROM agg, tacc ORDER BY source""".stripMargin,
      "The mixing loop CLOSED end-to-end: q94's weights drive a per-document acceptance test — keep doc iff md5-uniform(doc_id) < weight_source — and the realized post-sampling shares come out near the uniform target. Membership is a pure function of THE SAME CORPUS (no rand(): any run, cluster size, or engine reproduces it; the u < weight comparison is between identical doubles on both engines, so even the accept/reject booleans agree exactly). It is NOT stable under corpus growth: the weights move with the mixture, so adding data re-decides borderline docs — an incremental pipeline that needs frozen membership must PIN the weight table from a reference snapshot and join that instead (the threshold-is-a-constant property q61's split has by construction). Scale: two corpus scans (weight derivation, then acceptance — the registered query recomputes q94 inline), each a map-side-combined aggregate; the join broadcasts the |sources|-row weight table, so the corpus itself is never shuffled; persisting the weight table turns re-runs into one scan.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val w = mixtureWeights(docs).select(col("source"), col("weight"))
        val acc = docs
          .select(col("source"), col("doc_id"),
            nTokens(col("text")).as("n_tokens"))
          .join(broadcast(w), Seq("source"))
          .withColumn("accepted",
            (mdUniform(col("doc_id")) < col("weight")).cast("int"))
        val agg = acc.groupBy(col("source"), col("weight"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("accepted")).cast("long").as("n_accepted"),
            sum(col("n_tokens")).as("tokens"),
            sum(when(col("accepted") === 1, col("n_tokens")).otherwise(0L)).as("accepted_tokens"))
        val tacc = agg.agg(sum(col("accepted_tokens")).as("ta"))
        agg.crossJoin(broadcast(tacc))
          .select(col("source"), col("n_docs"), col("n_accepted"),
            col("tokens"), col("accepted_tokens"), col("weight"),
            (col("accepted_tokens").cast("double") / col("ta").cast("double")).as("realized_share"))
          .orderBy(col("source"))
    },

    Q("q102_token_shards",
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, source, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM tok)
        |SELECT doc_id, source, n_tokens,
        |  CAST(prior // 500 AS BIGINT) AS shard_id
        |FROM cum ORDER BY doc_id""".stripMargin,
      "Token-budget sharding — the training-data packing step that turns a deduped corpus into shards of ~budget tokens each (here 500): shard_id = floor(prior-token-cumsum / budget) over a DETERMINISTIC (source, doc_id) order, so every run, engine, and cluster size assigns identical shards (append-only corpora extend shards without reshuffling earlier docs — the property that makes incremental shard builds possible). The prefix sum runs PARTITIONED BY SOURCE — the honest 100 TB shape: a global-order cumsum would funnel the corpus through one range-partitioned task chain, while per-source sharding (what a mixture-weighted pipeline wants anyway — see q94/q95) bounds each window partition to a source and parallelizes across them; a source too large for one task splits by date/prefix the same way. Exact integer arithmetic end to end; q94's token counting (same split-on-space CTE) is reused verbatim.") {
      (s, d) =>
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tokens"))
          .withColumn("prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            // INTEGER division (Spark `div`, DuckDB `//`) — `/` promotes
            // to IEEE double, which quietly breaks the "exact integer
            // arithmetic" claim once a source's cumulative tokens pass
            // 2^53 (review catch, round 7)
            expr("prior div 500").cast("bigint").as("shard_id"))
          .orderBy(col("doc_id"))
    },

    Q("q111_dsir_importance",
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |dbc AS (
        |  SELECT doc_id, source, substr(md5(w), 1, 2) AS b, count(*) AS c
        |  FROM tok GROUP BY doc_id, source, b),
        |bc AS (
        |  SELECT b,
        |    CAST(sum(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN source <> 'src0' THEN c ELSE 0 END) AS BIGINT) AS cr
        |  FROM dbc GROUP BY b),
        |tot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr
        |  FROM bc),
        |wt AS (
        |  SELECT b,
        |    CAST(floor(ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE)) * 1e6) AS BIGINT)
        |      - CAST(floor(ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)) * 1e6) AS BIGINT)
        |      AS lnr
        |  FROM bc, tot),
        |s AS (
        |  SELECT d.doc_id, d.source, CAST(sum(d.c) AS BIGINT) AS n_tokens,
        |    CAST(sum(d.c * wt.lnr) AS BIGINT) AS slnr
        |  FROM dbc d JOIN wt USING (b)
        |  WHERE d.source <> 'src0'
        |  GROUP BY d.doc_id, d.source)
        |SELECT doc_id, source, n_tokens, avg_logratio, CAST(rn AS INT) AS rn FROM (
        |  SELECT doc_id, source, n_tokens,
        |    (slnr * 1e-6) / n_tokens AS avg_logratio,
        |    row_number() OVER (ORDER BY (slnr * 1e-6) / n_tokens DESC, doc_id) AS rn
        |  FROM s) t
        |WHERE rn <= 20 ORDER BY rn""".stripMargin,
      "DSIR-style importance ranking for data selection (Xie et al. 2023, 'Data Selection for Language Models via Importance Resampling'): score every raw-pool document by how much more likely its tokens are under a TARGET distribution (here source src0 stands in for the curated corpus) than under the raw pool, using hashed-token bucket LMs — the method's trick that keeps the feature space a FIXED 256 buckets regardless of vocabulary size. Per-doc weight = avg over tokens of ln p_target(bucket) − ln p_raw(bucket), add-1 smoothed; top-20 raw docs returned. Determinism is the q103 playbook: ln runs once per BUCKET (256 rows, not |vocab|, not |tokens|) and each ln term is floor-quantized to integer micro-nats separately, so every distributed sum is exact-integer and the final double division is one identical IEEE expression per row. Scale: explode → map-side-combined (doc, bucket) counts (≤256 distinct buckets per doc regardless of length); the bucket LM table is 256 rows — BROADCAST to the scoring join, so the corpus is shuffled once (by doc) and the target/raw LMs cost one more reduce over those same counts. At 100 TB the target-side counts come from the small curated corpus and the raw side from a sampled slice — the shape is unchanged; resampling the scored pool is q95's acceptance stage.") {
      (s, d) =>
        dsirImportanceTop(Tables.documents(s, d), "src0", 20)
    },

    Q("q119_packing_efficiency",
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |agg AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(sum((n_tokens + 499) // 500) AS BIGINT) AS windows_unpacked
        |  FROM tok GROUP BY source)
        |SELECT source, n_docs, total_tokens,
        |  CAST((total_tokens + 499) // 500 AS BIGINT) AS windows_packed,
        |  windows_unpacked,
        |  CAST(((total_tokens + 499) // 500) * 500 - total_tokens AS DOUBLE)
        |    / (((total_tokens + 499) // 500) * 500) AS padding_frac_packed,
        |  CAST(windows_unpacked * 500 - total_tokens AS DOUBLE)
        |    / (windows_unpacked * 500) AS padding_frac_unpacked
        |FROM agg ORDER BY source""".stripMargin,
      "Sequence-packing efficiency report — the decision table behind HOW training sequences are assembled: per source, the number of 500-token context windows needed when documents pack contiguously (cross-doc packing, documents split at window boundaries — q102's shard order makes this deterministic) vs one-doc-per-window with padding, and the padding waste each strategy carries. The unpacked padding fraction is the price of clean document isolation; the packed fraction (at most 499 tokens in the final window per source) is the price of cross-doc attention contamination — the table quantifies the trade the pipeline architect picks. Token counts reuse q94/q102's exact `nTokens` definition; ceil is the integer identity (t+499) div 500 on BOTH engines (never a float ceil), so every count is exact and the two waste fractions are single IEEE divisions. One map-side-combined |source| agg; text scanned once.") {
      (s, d) =>
        val agg = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tokens"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
            sum(expr("(n_tokens + 499) div 500")).as("windows_unpacked"))
        agg.select(col("source"), col("n_docs"), col("total_tokens"),
            expr("(total_tokens + 499) div 500").cast("bigint").as("windows_packed"),
            col("windows_unpacked"),
            (expr("((total_tokens + 499) div 500) * 500 - total_tokens").cast("double")
              / expr("((total_tokens + 499) div 500) * 500")).as("padding_frac_packed"),
            ((col("windows_unpacked") * 500 - col("total_tokens")).cast("double")
              / (col("windows_unpacked") * 500)).as("padding_frac_unpacked"))
          .orderBy(col("source"))
    },

    Q("q124_temperature_mixture",
      """WITH cnt AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |q AS (
        |  SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT) AS weight_micro
        |  FROM cnt),
        |tot AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS wt FROM q),
        |tgt AS (
        |  SELECT source, n_docs, weight_micro,
        |    CAST((200 * weight_micro) // wt AS BIGINT) AS target_n
        |  FROM q CROSS JOIN tot),
        |r AS (
        |  SELECT source, len(string_split(text, ' ')) AS n_tok,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents),
        |smp AS (
        |  SELECT r.source, CAST(count(*) AS BIGINT) AS sampled_docs,
        |    CAST(sum(r.n_tok) AS BIGINT) AS sampled_tokens
        |  FROM r JOIN tgt USING (source)
        |  WHERE r.rn <= tgt.target_n
        |  GROUP BY r.source)
        |SELECT t.source AS source, t.n_docs, t.weight_micro, t.target_n,
        |  COALESCE(s.sampled_docs, 0) AS sampled_docs,
        |  COALESCE(s.sampled_tokens, 0) AS sampled_tokens
        |FROM tgt t LEFT JOIN smp s ON t.source = s.source
        |ORDER BY t.source""".stripMargin,
      "Temperature-scaled mixture sampling (the exponential-smoothing rebalance of multilingual/multi-source corpora, tau = 0.5): per-source sampling weight proportional to n_docs^tau — flattening the source distribution toward uniform so long-tail sources are upsampled relative to their raw share — allocated against a fixed budget of 200 documents, then drawn DETERMINISTICALLY by ranking each source's docs on md5(doc_id) and keeping the first target_n (the same engine-portable stand-in for rand() as the q87/q95 samplers: identical membership on every run, cluster size, and engine). Determinism of the weights themselves: n^0.5 is IEEE sqrt (exactly specified, bit-identical cross-engine), floor-quantized to integer micro-weights so the normalizing sum is an exact integer, and each target is one integer floor-division — no double ever crosses an aggregation. Scale: two map-side-combined |source| aggregates plus one row_number window partitioned by source; at 100 TB the rank-by-hash becomes a threshold ON the hash value (keep md5 < target_n/n_docs scaled to the hash range — no per-source sort at all), the same flip the q95 acceptance stage documents; the ledger row per source is what a data-mixture card records next to q94's uniform-target weights.") {
      (s, d) =>
        temperatureMixture(Tables.documents(s, d), budget = 200)
    },

    Q("q74_kmv_distinct",
      """WITH h AS (
        |  SELECT DISTINCT o_orderpriority, md5(CAST(o_custkey AS VARCHAR)) AS h
        |  FROM orders),
        |grp AS (
        |  SELECT o_orderpriority, count(*) AS nd FROM h GROUP BY o_orderpriority),
        |kth AS (
        |  SELECT o_orderpriority, h AS kth FROM (
        |    SELECT o_orderpriority, h,
        |      row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
        |    FROM h) t
        |  WHERE rn = 256)
        |SELECT g.o_orderpriority,
        |  CAST(LEAST(nd, 256) AS INT) AS k_used,
        |  CASE WHEN nd < 256 THEN CAST(nd AS DOUBLE)
        |       ELSE CAST(255 AS DOUBLE) /
        |            (GREATEST(CAST('0x' || substring(kth, 1, 8) AS BIGINT), 1) / 4294967296.0)
        |  END AS est_distinct,
        |  CAST(nd AS BIGINT) AS exact_distinct
        |FROM grp g LEFT JOIN kth USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
      "KMV (k-minimum-values) distinct-count sketch per group (functions.KmvDistinct, k=256) — the mergeable, engine-PORTABLE alternative to HLL (q19): sketch state is the k smallest distinct md5 hashes, so the DuckDB twin re-derives state AND estimate exactly, making this the rare approximate-distinct with a full value-hash oracle. One shuffle on the group key; each map task ships at most k 32-char strings per group; merge is set-union-then-trim (idempotent — replays cannot inflate it). Below k distinct values the sketch degrades to the exact answer; the exact count rides along for comparison.") {
      (s, d) =>
        import s.implicits._
        val hashed = Tables.orders(s, d)
          .select(col("o_orderpriority"),
            md5(col("o_custkey").cast("string")).as("h"))
        val sk = hashed.as[(String, String)]
          .groupByKey(_._1)
          .agg(new graft.functions.KmvDistinct(256).toColumn)
          .toDF("o_orderpriority", "sk")
          .select(col("o_orderpriority"),
            col("sk._1").as("k_used"), col("sk._2").as("est_distinct"))
        val exact = hashed.distinct().groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("exact_distinct"))
        sk.join(exact, Seq("o_orderpriority")).orderBy(col("o_orderpriority"))
    },

    Q("q82_countmin_sketch",
      """WITH src AS (SELECT o_orderpriority AS g, o_custkey AS k FROM orders),
        |jb AS (
        |  SELECT g, j.j AS j,
        |    CAST('0x' || substring(md5(j.j || '|' || k), 1, 8) AS BIGINT) % 1024 AS b
        |  FROM src CROSS JOIN (SELECT unnest(range(4)) AS j) j),
        |cms AS (SELECT g, j, b, count(*) AS c FROM jb GROUP BY g, j, b),
        |probes AS (SELECT unnest([1, 7, 42]) AS probe),
        |grid AS (SELECT g, probe FROM (SELECT DISTINCT g FROM src) CROSS JOIN probes),
        |pb AS (
        |  SELECT g, probe, j.j AS j,
        |    CAST('0x' || substring(md5(j.j || '|' || probe), 1, 8) AS BIGINT) % 1024 AS b
        |  FROM grid CROSS JOIN (SELECT unnest(range(4)) AS j) j),
        |est AS (
        |  SELECT pb.g, pb.probe, CAST(min(COALESCE(cms.c, 0)) AS BIGINT) AS est_count
        |  FROM pb LEFT JOIN cms ON pb.g = cms.g AND pb.j = cms.j AND pb.b = cms.b
        |  GROUP BY pb.g, pb.probe),
        |exact AS (
        |  SELECT g, k AS probe, count(*) AS exact_count FROM src
        |  WHERE k IN (1, 7, 42) GROUP BY g, k)
        |SELECT est.g AS o_orderpriority, est.probe AS probe_custkey, est.est_count,
        |  CAST(COALESCE(exact.exact_count, 0) AS BIGINT) AS exact_count
        |FROM est LEFT JOIN exact ON est.g = exact.g AND est.probe = exact.probe
        |ORDER BY o_orderpriority, probe_custkey""".stripMargin,
      "Count-min sketch per group (d=4 md5-derived hash rows x w=1024 buckets), the third portable sketch alongside KMV (q74) and histogram quantiles (q75): state is a fixed d x w count matrix expressed as (group, row, bucket) partial counts — merges by ADDITION (map-side combined, <= d*w rows per group per task), and point queries answer min over rows of the probed buckets (never under, over by ~n/w). Because the hashes are md5-derived the twin re-derives sketch AND estimates exactly; the true counts ride along to show the overestimate honestly. The classic heavy-hitter/frequency primitive at 100 TB: one shuffle, constant state per group.") {
      (s, d) =>
        import s.implicits._
        val W = 1024
        def bucket(j: Column, k: Column): Column =
          pmod(conv(substring(md5(concat(j.cast("string"), lit("|"), k.cast("string"))),
            1, 8), 16, 10).cast("long"), lit(W.toLong))
        def jBuckets(k: Column): Column =
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("j"), bucket(lit(j), k).as("b"))): _*))
        // r17: the 4×md5 bucket derivation is the query's cost and runs
        // fused into the scan — one core on a single-row-group input.
        // fanNarrow spreads the two NARROW columns first (no-op at
        // scale); measured 1.05 → 0.78 s same-session at sf0.1.
        val src = Tables.fanNarrow(Tables.orders(s, d)
          .select(col("o_orderpriority").as("g"), col("o_custkey").as("k")))
        val cms = src.select(col("g"), jBuckets(col("k")).as("jb"))
          .groupBy(col("g"), col("jb.j").as("j"), col("jb.b").as("b"))
          .agg(count(lit(1)).as("c"))
        val probes = Seq(1L, 7L, 42L).toDF("probe")
        val grid = src.select(col("g")).distinct().crossJoin(broadcast(probes))
        val pb = grid.select(col("g"), col("probe"), jBuckets(col("probe")).as("jb"))
          .select(col("g"), col("probe"), col("jb.j").as("j"), col("jb.b").as("b"))
        val est = pb.join(cms, Seq("g", "j", "b"), "left")
          .groupBy(col("g"), col("probe"))
          .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
        val exact = src.filter(col("k").isin(1L, 7L, 42L))
          .groupBy(col("g"), col("k").as("probe"))
          .agg(count(lit(1)).as("exact_count"))
        est.join(exact, Seq("g", "probe"), "left")
          .select(col("g").as("o_orderpriority"), col("probe").as("probe_custkey"),
            col("est_count"), coalesce(col("exact_count"), lit(0L)).as("exact_count"))
          .orderBy(col("o_orderpriority"), col("probe_custkey"))
    },

    Q("q145_context_packing", q145OracleSql,
      "Concatenate-and-chunk context assignment — the EXECUTION of the packing strategy q119's efficiency table decides: every document gets its global token offset in the deterministic doc_id concatenation order, and from it the 512-token training-window span it lands in (start/end window, windows spanned, whether the doc is fragmented across a window boundary — the rows a contamination-sensitive eval pipeline needs to trace which windows saw which documents). The offset is a GLOBAL prefix sum, and the implementation is the scalable two-level form, not a single-partition window: per-doc counts fold to range-bucket subtotals (doc_id div 64 — at 100 TB the bucket is the ingest partition), the tiny |buckets| frame takes the only serial cumulative pass (|corpus|/64 rows... actually |buckets| rows, broadcastable), and each bucket's interior offsets run as a PARALLEL partitioned window — no stage ever sorts the corpus through one task, the textbook distributed scan pattern. Integer arithmetic end-to-end (ceil-free div identities, the q119 rule), token counts from the shared q94/q102 nTokens definition; the oracle states the same semantics as the naive single window, proving the two-level decomposition exact. Window size 512 with ~55-token docs means roughly every tenth document straddles a window boundary — the fragmented flag is exercised, not vestigial, at sf0.01.") {
      (s, d) =>
        contextPacking(Tables.documents(s, d), windowTokens = 512, bucketDocs = 64)
    },

    Q("q158_window_provenance",
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS o
        |  FROM tok),
        |pw AS (SELECT doc_id, source, CAST(o // 512 AS BIGINT) AS s,
        |         CAST((o + n_tok - 1) // 512 AS BIGINT) AS e
        |       FROM off),
        |wx AS (SELECT unnest(generate_series(s, e)) AS window_id,
        |         doc_id, source FROM pw)
        |SELECT window_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  count(DISTINCT source) > 1 AS mixed_source,
        |  min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
        |FROM wx GROUP BY window_id ORDER BY window_id""".stripMargin,
      "Window provenance — q145 inverted: for each 512-token training window, WHICH documents occupy it (count, id range) and whether they come from more than one source. This is the cross-doc-attention contamination audit behind the packing decision q119 prices: concat-and-chunk packing lets attention flow across document boundaries inside a window, and a window mixing SOURCES (or, in production, licensing classes / languages / safety tiers) is the case packing policies actually restrict — the mixed_source share is the number that decides per-source packing streams vs one global stream. Also the lineage table an eval-contamination probe joins against (which windows saw holdout docs — q153's window leg per doc, here per window). Derivation rides q145's scalable prefix sum (same two-level plan; the oracle states the naive window) with source riding contextPacking's carry — one documents scan, no doc-key join — then one explode of each doc's 1-2 window ids (bounded by spans, ∝ corpus, 8-byte rows) and a map-side-combined |windows|-key aggregate; all counts exact integers. At sf0.01: 54 windows, every one multi-doc, 53/54 mixed-source — the packing default is maximally contaminating, which is exactly the point of measuring it.") {
      (s, d) =>
        contextPacking(Tables.documents(s, d),
          windowTokens = 512, bucketDocs = 64, carry = Seq("source"),
          sorted = false)
          .select(col("doc_id"), col("source"),
            explode(sequence(col("start_window"), col("end_window")))
              .as("window_id"))
          .groupBy(col("window_id"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            countDistinct(col("source")).cast("bigint").as("n_sources"),
            (countDistinct(col("source")) > 1).as("mixed_source"),
            min(col("doc_id")).as("first_doc_id"),
            max(col("doc_id")).as("last_doc_id"))
          .orderBy(col("window_id"))
    },

    Q("q160_token_waterfill",
      """WITH caps AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS capacity
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM caps),
        |ranked AS (
        |  SELECT c.source, c.capacity, t.n,
        |    CAST(row_number() OVER (ORDER BY c.capacity, c.source)
        |      AS BIGINT) AS i,
        |    CAST(sum(c.capacity) OVER (ORDER BY c.capacity, c.source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS prefix
        |  FROM caps c CROSS JOIN tot t),
        |s AS (
        |  SELECT *, capacity * (n - i + 1) <= 25000 - (prefix - capacity)
        |    AS saturated
        |  FROM ranked),
        |cut AS (
        |  SELECT CAST(sum(CASE WHEN saturated THEN 1 ELSE 0 END) AS BIGINT)
        |      AS k,
        |    CAST(sum(CASE WHEN saturated THEN capacity ELSE 0 END) AS BIGINT)
        |      AS satcap
        |  FROM s)
        |SELECT source, capacity,
        |  CAST(CASE WHEN saturated THEN capacity
        |    ELSE (25000 - satcap) // (n - k)
        |      + CASE WHEN i - k <= (25000 - satcap) % (n - k)
        |             THEN 1 ELSE 0 END
        |    END AS BIGINT) AS allocation,
        |  saturated
        |FROM s CROSS JOIN cut ORDER BY source""".stripMargin,
      "Token-budget waterfilling — the allocation SOLVE behind mixture design, where q94/q124/q149 produce weights and something must turn them into per-source token grants that respect each source's actual capacity: every source receives min(capacity, level) with the water level chosen so grants sum EXACTLY to the 25k budget (capacity-poor sources saturate and keep everything; the surplus redistributes to the rest — the capped-upsampling rule that stops a tiny source being asked for tokens it does not have). Entirely EXACT integer arithmetic, including the classic fractional-level problem: instead of a float level, the integer level is (budget − saturated_capacity) div (n − k) with the division remainder granted as +1 to the first r unsaturated sources in (capacity, source) order — so Σ allocation == budget holds as an integer identity for any budget <= Σ capacity (beyond that every source saturates and the grant is the capacity vector — the corpus cannot supply more; the n > k guard makes the div/(n-k) branch structurally unreachable there), spec-pinned, with no rounding drift anywhere. The saturation test is per-row and monotone (capacity·(remaining sources) ≤ remaining budget), so the cut needs no iteration — one window pass finds it. Scale: capacities are one map-side-combined |sources| aggregate; every window/join after runs on that bounded frame (the single-partition window touches |sources| rows, never the corpus). Both saturation outcomes exercised at verify scale (2 of 20 sources saturate at the 25k budget; the remainder grants land on the lowest-capacity unsaturated source).") {
      (s, d) =>
        tokenWaterfill(Tables.documents(s, d), budget = 25000L)
    },

    Q("q152_split_balance",
      """WITH s AS (
        |  SELECT label,
        |    CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'cc'
        |           THEN 'train'
        |         WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM embeddings),
        |c AS (
        |  SELECT label,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_val,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test,
        |    CAST(count(*) AS BIGINT) AS n_total
        |  FROM s GROUP BY label),
        |g AS (SELECT CAST(sum(n_train) AS BIGINT) AS gt,
        |             CAST(sum(n_val) AS BIGINT) AS gv,
        |             CAST(sum(n_test) AS BIGINT) AS gs,
        |             CAST(sum(n_total) AS BIGINT) AS gn FROM c)
        |SELECT label, n_train, n_val, n_test, n_total,
        |  (CAST(n_train AS DOUBLE) - CAST(n_total AS DOUBLE) * gt / gn)
        |    * (CAST(n_train AS DOUBLE) - CAST(n_total AS DOUBLE) * gt / gn)
        |    / (CAST(n_total AS DOUBLE) * gt / gn)
        |  + (CAST(n_val AS DOUBLE) - CAST(n_total AS DOUBLE) * gv / gn)
        |    * (CAST(n_val AS DOUBLE) - CAST(n_total AS DOUBLE) * gv / gn)
        |    / (CAST(n_total AS DOUBLE) * gv / gn)
        |  + (CAST(n_test AS DOUBLE) - CAST(n_total AS DOUBLE) * gs / gn)
        |    * (CAST(n_test AS DOUBLE) - CAST(n_total AS DOUBLE) * gs / gn)
        |    / (CAST(n_total AS DOUBLE) * gs / gn) AS chi2
        |FROM c CROSS JOIN g ORDER BY label""".stripMargin,
      "Per-label split-balance audit of the q61 hash split — the eval-hygiene check that a deterministic 80/10/10 split did not accidentally starve a class: per label its train/val/test counts and the chi-square statistic against the expectation that every label splits at the GLOBAL split shares (expected cell = label_total x global_share); a label with chi2 far above the others has its evaluation dominated by sampling noise and is the one to stratify explicitly. Membership is the identical md5-bucket rule q61/q87 pin (no rand, engine-portable), so this audit replays bit-identically anywhere. Determinism: all counts exact integers from one map-side-combined |label|x3 aggregate; each chi-square is one fixed THREE-TERM IEEE expression per row over those integers (terms written out, never a float sum over rows); the global totals are a broadcast one-row aggregate. Scale: one corpus scan, bounded keys, no joins wider than the one-row cross.") {
      (s, d) =>
        val e = Tables.embeddings(s, d)
          .select(col("label"), splitOf(col("vec_id")).as("split"))
        val c = e.groupBy(col("label"))
          .agg(
            sum(when(col("split") === "train", 1L).otherwise(0L))
              .cast("bigint").as("n_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L))
              .cast("bigint").as("n_val"),
            sum(when(col("split") === "test", 1L).otherwise(0L))
              .cast("bigint").as("n_test"),
            count(lit(1)).cast("bigint").as("n_total"))
        val g = c.agg(sum(col("n_train")).cast("bigint").as("gt"),
          sum(col("n_val")).cast("bigint").as("gv"),
          sum(col("n_test")).cast("bigint").as("gs"),
          sum(col("n_total")).cast("bigint").as("gn"))
        def term(obs: String, share: String) = {
          val exp = col("n_total").cast("double") * col(share) / col("gn")
          (col(obs).cast("double") - exp) * (col(obs).cast("double") - exp) / exp
        }
        c.crossJoin(broadcast(g))
          .select(col("label"), col("n_train"), col("n_val"), col("n_test"),
            col("n_total"),
            (term("n_train", "gt") + term("n_val", "gv")
              + term("n_test", "gs")).as("chi2"))
          .orderBy(col("label"))
    },

    Q("q164_epoch_plan",
      """WITH caps AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS capacity
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, capacity,
        |    CAST(floor(sqrt(CAST(capacity AS DOUBLE)) * 1e6) AS BIGINT)
        |      AS weight_micro
        |  FROM caps),
        |tot AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS wt FROM w),
        |tgt AS (
        |  SELECT source, capacity, weight_micro,
        |    CAST((CAST(26500 AS HUGEINT) * weight_micro) // wt AS BIGINT)
        |      AS target_tokens
        |  FROM w CROSS JOIN tot)
        |SELECT source, capacity, weight_micro, target_tokens,
        |  CAST(target_tokens AS DOUBLE) / CAST(capacity AS DOUBLE) AS epochs,
        |  target_tokens > capacity AS upsampled
        |FROM tgt ORDER BY source""".stripMargin,
      "The epoch plan — the data-loader schedule implied by a token budget under temperature-tau=0.5 mixture weights (weight proportional to sqrt of token capacity — q124's flattening applied to token mass instead of doc counts): per source its integer token grant budget*w_i/sum(w) and epochs = grant/capacity, the repeat factor. epochs > 1 IS upsampling — the source repeats inside one budget pass, the regime q160's waterfill refuses by construction (it caps every grant at capacity) and real mixtures deliberately enter for scarce high-quality sources; this table and q160 are the two allocation policies a mixture designer compares. Both regimes are exercised at verify scale (the 26.5k budget ~ corpus size, and sqrt-flattening pushes the 4 scarcest sources above 1 epoch while the other 16 stay below). Determinism: capacities and the micro-quantized weights are exact integers; the budget*weight product runs in decimal(38,0) against the oracle's HUGEINT (the q147 wrap lesson — int64 dies silently at planetary budgets); epochs is one IEEE division. Scale: one map-side-combined |sources| aggregate, everything after on that bounded frame.") {
      (s, d) =>
        epochPlan(Tables.documents(s, d), budget = 26500L)
    },

    Q("q167_overlap_chunks",
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |nc AS (
        |  SELECT doc_id, nt,
        |    CASE WHEN nt <= 32 THEN 1
        |         ELSE (nt - 32 + 23) // 24 + 1 END AS n
        |  FROM tok),
        |ex AS (SELECT doc_id, nt, unnest(range(n)) AS i FROM nc)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
        |  CAST(i * 24 AS BIGINT) AS tok_start,
        |  CAST(least(i * 24 + 32, nt) AS BIGINT) AS tok_end,
        |  CAST(least(i * 24 + 32, nt) - i * 24 AS BIGINT) AS n_tokens
        |FROM ex ORDER BY doc_id, chunk_id""".stripMargin,
      "Retrieval-corpus chunking with OVERLAP (window 32 tokens, stride 24 — 8-token overlap): the RAG/embedding ingestion shape q145's packing deliberately is NOT. Packing tiles disjoint training windows across a global token ledger (documents fragment at arbitrary offsets); a retrieval corpus instead cuts each document INDEPENDENTLY with overlapping windows so no boundary sentence is unembeddable — the splitter every vector-store ingest runs before q36/q49 can serve it. Chunks start at stride multiples; emission stops with the first chunk whose end reaches the document end (nchunks = ceil((n-W)/S)+1 floored at 1 — the standard splitter rule, so no fully-contained tail chunks; the two integer-division forms, Spark div on a guarded-positive numerator and DuckDB floor-//, agree exactly where evaluated). Every column is exact integer arithmetic on the family's one token count. Scale: a pure projection plus a bounded per-doc explode (~n/S rows per doc) — ZERO body shuffles; at 100 TB this fuses into whatever scan feeds the embedder, which is the entire point of expressing it declaratively.") {
      (s, d) =>
        overlapChunks(Tables.documents(s, d), windowTokens = 32, stride = 24)
    },

    Q("q170_dedup_aware_epochs",
      """WITH corpus AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, text FROM documents
        |  WHERE doc_id % 3 = 0),
        |tok AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM corpus),
        |caps AS (
        |  SELECT source, CAST(sum(nt) AS BIGINT) AS capacity
        |  FROM tok GROUP BY source),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM (
        |    SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
        |      doc_id
        |    FROM corpus)
        |  GROUP BY fp),
        |ucaps AS (
        |  SELECT c.source, COALESCE(u.capacity, 0) AS capacity
        |  FROM caps c LEFT JOIN (
        |    SELECT source, CAST(sum(nt) AS BIGINT) AS capacity
        |    FROM tok JOIN keep USING (doc_id) GROUP BY source) u
        |  ON c.source = u.source),
        |wn AS (
        |  SELECT source, capacity,
        |    CAST(floor(sqrt(CAST(capacity AS DOUBLE)) * 1e6) AS BIGINT) AS wm
        |  FROM caps),
        |wu AS (
        |  SELECT source, capacity,
        |    CAST(floor(sqrt(CAST(capacity AS DOUBLE)) * 1e6) AS BIGINT) AS wm
        |  FROM ucaps),
        |tn AS (SELECT CAST(sum(wm) AS BIGINT) AS wt FROM wn),
        |tu AS (SELECT CAST(sum(wm) AS BIGINT) AS wt FROM wu),
        |pn AS (
        |  SELECT source, capacity,
        |    CAST((CAST(26500 AS HUGEINT) * wm) // wt AS BIGINT) AS target_nominal
        |  FROM wn CROSS JOIN tn),
        |pu AS (
        |  SELECT source, capacity AS unique_capacity,
        |    CAST((CAST(26500 AS HUGEINT) * wm) // wt AS BIGINT) AS target_replanned
        |  FROM wu CROSS JOIN tu)
        |SELECT p.source, p.capacity, u.unique_capacity,
        |  p.capacity - u.unique_capacity AS dup_tokens,
        |  p.target_nominal,
        |  CAST(p.target_nominal AS DOUBLE) / CAST(p.capacity AS DOUBLE)
        |    AS epochs_nominal,
        |  CASE WHEN u.unique_capacity > 0 THEN
        |    CAST(p.target_nominal AS DOUBLE) / CAST(u.unique_capacity AS DOUBLE)
        |  END AS epochs_on_unique,
        |  u.target_replanned,
        |  CASE WHEN u.unique_capacity > 0 THEN
        |    CAST(u.target_replanned AS DOUBLE) / CAST(u.unique_capacity AS DOUBLE)
        |  END AS epochs_replanned
        |FROM pn p JOIN pu u USING (source) ORDER BY p.source""".stripMargin,
      "The dedup x mixture interaction — q164's nominal tau=0.5 epoch plan next to the plan REPLANNED on unique content, where unique capacity keeps one document per exact content fingerprint (the q32 keeper election verbatim: min doc_id per Dedup.exactDedup fingerprint, cross-source; the corpus is unioned with a shifted copy of every third document, the q32/q85 fixture convention, so ~1/4 of each source's mass is provably duplicated). Planning on raw capacities silently spends budget re-reading duplicated mass; this table quantifies BOTH failure modes: epochs_on_unique is what the nominal grant really does to unique content (the hidden upsampling a loader executes when dedup runs after planning), and target_replanned/epochs_replanned is the grant the designer should have issued. Both legs run through epochPlanFromCaps — ONE planner definition (weight quantization, decimal(38,0) grant arithmetic, epoch division), capacities the only difference, the composition-over-copy principle. A source whose every document loses the keeper election stays in the table at unique_capacity 0 with NULL epoch ratios (guarded identically on both engines — ANSI Spark throws on the raw division), never silently dropped. Determinism: capacities/keepers/grants exact integer+decimal arithmetic against the oracle's HUGEINT; the epoch ratios are single IEEE divisions. Scale: one corpus scan to token counts (checkpointed, shared by both capacity legs), one map-side-combined md5-fingerprint aggregate + doc_id semi-join for keepers, then everything on |sources|-row frames.") {
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("doc_id"), col("source"), col("text"))
        val corpus = docs.unionAll(
          docs.filter(col("doc_id") % 3 === 0).select(
            (col("doc_id") + 1000000).as("doc_id"), col("source"), col("text")))
        dedupAwareEpochPlan(corpus, budget = 26500L)
      }
    },

    Q("q173_soft_dedup_sample",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 4 = 0),
        |fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |  FROM corpus),
        |cl AS (SELECT fp, count(*) AS n_copies FROM fp GROUP BY fp),
        |tagged AS (
        |  SELECT f.fp, c.n_copies,
        |    CAST('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 12) AS BIGINT)
        |      <= 281474976710655 // c.n_copies AS kept
        |  FROM fp f JOIN cl c USING (fp))
        |SELECT CAST(n_copies AS BIGINT) AS n_copies,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_clusters,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(kept AS INTEGER)) AS BIGINT) AS n_kept,
        |  CAST(sum(CAST(kept AS INTEGER)) AS DOUBLE) / count(*) AS kept_rate,
        |  CAST(1.0 AS DOUBLE) / n_copies AS expected_rate
        |FROM tagged GROUP BY n_copies ORDER BY n_copies""".stripMargin,
      "Soft-dedup sampling — keep each document with probability 1/|its exact-dup cluster|, so every duplicate cluster contributes ONE document in expectation WITHOUT a keeper election: the dedup-by-reweighting alternative to q32's hard min-doc_id keeper (which biases survivors toward old crawls), used when duplicates carry metadata worth mixing over. The decision is deterministic and engine-portable: u = first 12 hex chars of md5(doc_id) as an integer in [0, 2^48), keep iff u <= (2^48 - 1) div n_copies — exactly u * n < 2^48 for integer u but overflow-free at any cluster size (the product form wraps int64 past 2^15 copies), pure int64 arithmetic, no rand(), the q61 split-function convention applied to inclusion sampling; cluster sizes come from the exact q32/q168 fingerprint (one normalization definition). The fixture is the shifted-union convention (every 2nd doc doubled, every 4th tripled) so sizes 1/2/3 are all provably exercised; the n=1 row anchors exactness (u < 2^48 always, kept_rate exactly 1.0) and size-2/3 rows realize ~1/2 and ~1/3. Determinism: counts exact; kept_rate integer/integer IEEE division; expected_rate double-cast before dividing (a bare 1.0/n would run DECIMAL division in the oracle engine). Scale: one fingerprint projection + one md5-key map-side-combined cluster aggregate + one fp-key join + a |distinct sizes|-key aggregate — all linear on bounded keys, never pairwise.") {
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val corpus = docs
          .unionAll(docs.filter(col("doc_id") % 2 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
          .unionAll(docs.filter(col("doc_id") % 4 === 0)
            .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
        softDedupSample(corpus)
      }
    },

    Q("q179_sample_extrapolation",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0),
        |base AS (
        |  SELECT doc_id, text,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS s
        |  FROM corpus),
        |cnt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS nds,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tk,
        |    CAST(sum(CASE WHEN s THEN len(string_split_regex(trim(text), '\s+'))
        |             ELSE 0 END) AS BIGINT) AS tks
        |  FROM base),
        |voc AS (
        |  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v,
        |    CAST(count(DISTINCT CASE WHEN s THEN w END) AS BIGINT) AS vs
        |  FROM (SELECT s, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |        FROM base)),
        |dup AS (
        |  SELECT coalesce(CAST(sum(CASE WHEN na >= 2 THEN na ELSE 0 END) AS BIGINT),
        |           0) AS dd,
        |    coalesce(CAST(sum(CASE WHEN ns >= 2 THEN ns ELSE 0 END) AS BIGINT),
        |           0) AS dds
        |  FROM (
        |    SELECT count(*) AS na, sum(CASE WHEN s THEN 1 ELSE 0 END) AS ns
        |    FROM (SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
        |                  'g'))) AS fp, s
        |          FROM base) t
        |    GROUP BY fp) g),
        |m AS (
        |  SELECT 'n_docs' AS metric, nd AS exact, nds AS sample FROM cnt
        |  UNION ALL SELECT 'n_tokens', tk, tks FROM cnt
        |  UNION ALL SELECT 'vocab_size', v, vs FROM voc
        |  UNION ALL SELECT 'dup_docs', dd, dds FROM dup)
        |SELECT metric, exact, sample,
        |  CAST(sample * 16 AS BIGINT) AS extrapolated,
        |  CASE WHEN exact > 0
        |    THEN CAST(sample * 16 - exact AS DOUBLE) / CAST(exact AS DOUBLE)
        |  END AS rel_err
        |FROM m ORDER BY metric""".stripMargin,
      "Sampled-profiling validation table — which corpus statistics can a deterministic 1/16 block sample (the q123 md5-prefix convention) honestly estimate? At 100 TB nobody profiles the full corpus before acting on it; they profile a sample and extrapolate, and this table is the checklist that says per statistic whether that recipe is sound: exact value, sample value, 16x extrapolation, relative error, for four metrics spanning the three sampling regimes. n_docs/n_tokens are LINEAR (extrapolation unbiased — the recipe works); vocab_size is SUBLINEAR (Heaps' law: the sample already holds most of the vocabulary, so x16 wildly OVER-estimates); dup_docs (docs in exact-fingerprint clusters >= 2, the q32 definition) is SUPERLINEAR in the sampling sense (a dup pair survives only when BOTH members sample, p^2 = 1/256, so x16 wildly UNDER-estimates — the reason sampled dedup audits lie). The two biased rows are the point, not a defect (the q159 surfaced-degeneracy convention). Runs on the q170-convention fixture corpus (every 3rd doc doubled under a shifted id, built in the registration body — the operator itself profiles whatever corpus it is given) so the dup row is provably non-zero at test scale. Determinism: sample membership is a pure function of doc_id (identical md5 text both engines); every exact/sample/extrapolated value is an exact integer; rel_err one guarded IEEE division (NULL at exact = 0 identically on both engines); vocab counts distinct 64-bit token hashes vs the oracle's distinct strings — the family's 2^-64 collision trade, policed by this oracle. Scale: ONE corpus scan feeding three bounded aggregates (a count/sum pair, a two-sided countDistinct over one exploded token stream, one md5-fingerprint-key map-side-combined aggregate carrying full and sample counts together) — the sample column rides the same pass, nothing is scanned twice; in production the exact columns drop away and the probe touches 1/16 of the data.") {
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val corpus = docs.unionAll(
          docs.filter(col("doc_id") % 3 === 0).select(
            (col("doc_id") + 1000000).as("doc_id"), col("text")))
        sampleExtrapolation(corpus)
      }
    },

    Q("q187_packing_state_served", q145OracleSql,
      "q145's concat-and-chunk window assignment served FROM the MAINTAINED packing ledger instead of a full-corpus prefix-sum pass — the packing family's entry in the q180–q186 serving posture, and the read that closes the last maintained-state family without a driver-hash-gated serving twin. The state dir is built once per (session, corpus) by folding the corpus through PackingStream.update in two doc_id-RANGE waves (the SAME staged-write/atomic-rename micro-batch commit the maintenance stream runs; wave 1 continues from wave 0's ledger high-water mark, then REPLAYS so the commit-marker no-op path executes against real state), and every timed run then pays ONLY the serving read: a scan of the 32-byte/doc ledger plus the shared Sampling.windowSpans projection — the corpus TEXT is never touched at read time; tokenization was paid once at arrival. The oracle twin is q145's SQL verbatim, so a hash match proves end-to-end that incremental offset assignment (per-batch two-level prefix sums continued from a persisted high-water mark, across a batch boundary and a replay) and the single-pass batch recompute are value-identical — the PackingStreamSpec state==batch contract re-checked by the driver's own harness every round. Scale: this is how a 100 TB ingest traces training windows — the ledger EXTENDS per batch (|batch| tokenization + an 8-byte anti-join probe + a footer-stats max), and the read side is a pure projection over 32 bytes/doc of state.") {
      (s, d) =>
        graft.streaming.PackingStream.windows(s,
          servedPackingStateDir(s, d), windowTokens = 512)
    },

    Q("q207_forgotten_packing_state_served", q207OracleSql,
      "q187's window-assignment table served AFTER a right-to-be-forgotten pass against the maintained packing ledger — the deletion family's final mutable-state leg, and the ONE layout where deletion cannot be an anti-join: offsets are order-dependent (q153 prices exactly this blast radius), so PackingStream.forget executes a bounded SUFFIX repack — the ledger prefix before the first tombstoned doc's offset is untouched (at 100 TB, with a recent deletion subject, nearly the whole ledger), the suffix drops the tombstoned rows and recomputes offsets in the ledger's own arrival order via the same two-level prefix sum q145 rides (per-bucket subtotals over a tiny ordered bucket frame + parallel within-bucket running sums — never a global window or a re-sort), and the result swaps in under the two-rename protocol. The oracle is q145's SQL over the tombstone-survivor documents (the shared md5-bucket rule), so the hash gate proves the repacked ledger equals a fresh full pack of exactly the survivors — window ids, spans, fragmentation flags and all; the builder REPLAYS the forget (no tombstoned doc remains -> early-return no-op) so the gate also re-proves repack idempotence cross-engine. Scale: deletion cost is one footer-stats min probe + a suffix-bounded repack + a broadcast tombstone anti-join; the corpus text is never touched (token counts live in the 32-byte/doc ledger), and the serving read stays q187's pure projection.") {
      (s, d) =>
        graft.streaming.PackingStream.windows(s,
          servedForgottenPackingDir(s, d), windowTokens = 512)
    },
  )

  /** q160: exact integer waterfilling of a token budget across sources —
    * every source gets min(capacity, level) with the level chosen so the
    * allocations sum EXACTLY to the budget (integer remainder spread over
    * the first unsaturated sources in capacity order).
    *
    * Identity scope: `sum(allocation) == budget` holds for
    * budget <= sum(capacity). A budget at or above total capacity
    * saturates every source and the allocation IS the capacity vector
    * (sum == capacity, the most the corpus can supply) — there is no
    * level that could manufacture the missing tokens. In that regime
    * k == n and the unsaturated div/(n-k) branch is unreachable; the
    * explicit n > k guard below keeps that a structural fact instead
    * of a bet on lazy CASE evaluation across engines. */
  def tokenWaterfill(docs: org.apache.spark.sql.DataFrame,
      budget: Long): org.apache.spark.sql.DataFrame = {
    val caps = docs
      .select(col("source"), nTokens(col("text")).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).cast("bigint").as("capacity"))
    // the whole computation runs on the |sources| frame: the ordered
    // windows below are single-partition over a bounded-key aggregate,
    // never over the corpus
    val w = Window.orderBy(col("capacity"), col("source"))
    val tot = caps.agg(count(lit(1)).cast("bigint").as("n"))
    val ranked = caps.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(w).cast("bigint"))
      .withColumn("prefix",
        sum(col("capacity")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      // source i saturates iff granting every source from i on its own
      // capacity-i level still fits the remaining budget
      .withColumn("saturated",
        col("capacity") * (col("n") - col("i") + 1)
          <= lit(budget) - (col("prefix") - col("capacity")))
    val cut = ranked.agg(
      sum(when(col("saturated"), 1L).otherwise(0L)).cast("bigint").as("k"),
      sum(when(col("saturated"), col("capacity")).otherwise(0L))
        .cast("bigint").as("satcap"))
    ranked.crossJoin(broadcast(cut))
      .withColumn("alloc",
        when(col("saturated"), col("capacity"))
          // n > k: an unsaturated row cannot exist when everything
          // saturated (budget >= total capacity), so this branch is
          // unreachable in that regime — the guard makes the zero
          // divisor structurally impossible rather than relying on
          // lazy CASE evaluation
          .when(col("n") > col("k"),
            expr(s"($budget - satcap) div (n - k)")
              + when(col("i") - col("k")
                  <= expr(s"($budget - satcap) % (n - k)"), 1L)
                .otherwise(0L)))
      .select(col("source"), col("capacity"),
        col("alloc").cast("bigint").as("allocation"), col("saturated"))
      .orderBy(col("source"))
  }

  /** q145: global token offsets + 512-token window spans via the scalable
    * two-level prefix sum (per-bucket subtotals → serial cumulate over the
    * tiny bucket frame → parallel within-bucket windows). */
  def contextPacking(docsIn: org.apache.spark.sql.DataFrame,
      windowTokens: Int, bucketDocs: Int,
      carry: Seq[String] = Nil,
      sorted: Boolean = true): org.apache.spark.sql.DataFrame = {
    val carryCols = carry.map(col)
    val tok = docsIn
      .select(col("doc_id") +: nTokens(col("text")).as("n_tok") +:
        expr(s"doc_id div $bucketDocs").cast("bigint").as("bkt") +:
        carryCols: _*)
    // level 1: per-bucket totals, cumulated over the tiny bucket frame
    val bktOff = tok.groupBy(col("bkt"))
      .agg(sum(col("n_tok")).as("bkt_tok"))
      .withColumn("bkt_off",
        coalesce(sum(col("bkt_tok")).over(
          Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("bkt_off"))
    // level 2: parallel within-bucket running sum + broadcast bucket base
    val local = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    windowSpans(
      tok.join(broadcast(bktOff), "bkt")
        .withColumn("tok_offset",
          (coalesce(sum(col("n_tok")).over(local), lit(0L)) + col("bkt_off"))
            .cast("bigint"))
        .select(col("doc_id") +: col("n_tok") +: col("tok_offset") +:
          carryCols: _*),
      windowTokens, carry, sorted)
  }

  /** Window-span projection over a (doc_id, n_tok, tok_offset) frame —
    * ONE definition for the batch query (q145) and the streaming
    * ledger reader (PackingStream.windows), so the span math cannot
    * silently diverge between them. */
  def windowSpans(offsets: org.apache.spark.sql.DataFrame,
      windowTokens: Int,
      carry: Seq[String] = Nil,
      sorted: Boolean = true): org.apache.spark.sql.DataFrame = {
    val wt = windowTokens
    val spans = offsets.select(Seq(col("doc_id"), col("n_tok"), col("tok_offset"),
      expr(s"tok_offset div $wt").cast("bigint").as("start_window"),
      expr(s"(tok_offset + n_tok - 1) div $wt").cast("bigint")
        .as("end_window"),
      (expr(s"(tok_offset + n_tok - 1) div $wt")
        - expr(s"tok_offset div $wt") + lit(1L)).cast("bigint")
        .as("n_windows"),
      (expr(s"(tok_offset + n_tok - 1) div $wt")
        > expr(s"tok_offset div $wt")).as("fragmented"))
      ++ carry.map(col): _*)
    // aggregate consumers (q158) skip the presentation sort — a global
    // range shuffle of the corpus frame their groupBy would discard
    if (sorted) spans.orderBy(col("doc_id")) else spans
  }
}
