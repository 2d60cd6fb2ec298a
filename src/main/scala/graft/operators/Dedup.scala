package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.TextFunctions._

/** Deduplication family over `documents`: exact (fingerprint groupBy),
  * n-gram Jaccard near-dup, and banded MinHash-LSH candidate generation.
  *
  * Scale posture — the part that matters at 100 TB:
  *  - exact dedup is ONE shuffle on a 16-byte fingerprint (not the text);
  *  - the naive all-pairs Jaccard is O(n²) and never materialized: pairs
  *    are generated only for documents sharing a shingle (inverted-index
  *    join), and at scale the MinHash band join replaces even that —
  *    candidates are pairs agreeing on a 2-row band, a constant-size key,
  *    so the shuffle is |docs|×|bands| rows regardless of text length;
  *  - hot shingles (stopword trigrams) are the skew risk: the LSH path
  *    buckets by (band, signature) whose cardinality concentrates far
  *    less than raw shingles; AQE skew-join splits any residual hot key.
  *
  * MinHash here is built from md5 (engine-independent, hence
  * oracle-checkable): h_i(doc) = lexicographic MIN of md5(i || "|" ||
  * shingle) — a valid min-wise permutation family for dedup purposes.
  */
object Dedup {

  /** Hot-bucket cap / document-frequency cut the REGISTERED end-to-end
    * dedup queries ship with (q33/q81/q127): the value a 100 TB run
    * would use — a 16-bit simhash band bucket or a shingle posting list
    * above 1000 members is template/boilerplate mass, and all-pairs
    * enumeration inside it is quadratic work the star/cut path avoids —
    * while being provably INERT on the testdata (tools/BucketProbe at
    * sf0.1: max simhash bucket 291, max shingle df 25; DedupScaleSpec
    * pins capped == uncapped byte-identity under inert caps), so the
    * DuckDB oracle, which computes the uncapped semantics, still
    * hash-matches. */
  val DefaultMaxBucket = 1000
  val DefaultMaxDocFreq = 1000

  /** Inverted index keyed by a 64-bit shingle hash (single-eval
    * [[graft.expressions.ShingleHash64]]): the join/shuffle carries
    * 8-byte longs instead of ~30-char strings, and the tokenize/window
    * loop runs compiled, not per-element interpreted. Hash collisions
    * would be needed to change a Jaccard count (~2⁻⁶⁴ per shingle pair)
    * — the standard trade at scale. */
  private[graft] def hashedShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.expressions.ShingleHash64(col("text"))).as("h"))

  /** ONE compiled-ShingleHash64 pass over the corpus, eagerly
    * localCheckpoint-ed as per-doc DISTINCT hash ARRAYS — the shared
    * substrate for the inverted-index family (q33/q157/q80/q144), whose
    * round-9 shapes re-ran the regex shingle extraction once per plan
    * branch (3–4 corpus passes each: both self-join sides, the size
    * aggregate, the df cut). Exploding stored 8-byte longs is cheap;
    * extraction is the expensive part. The checkpoint stores ~8 bytes
    * per shingle — the same size class as the text itself, partition-
    * local, never a driver collect (the round-3 design note warned
    * against caching the EXPLODED index, which repeats doc_id per
    * shingle row and defeats column-run compression; the array form
    * doesn't). Extra columns (e.g. a split tag) ride along so
    * consumers need no post-explode join. Measured r10 at sf0.1:
    * q33 2.4→1.3 s, q157 2.1→1.2 s, q80/q144 also improved. */
  private def shingleArrays(docs: DataFrame, extra: Column*): DataFrame = {
    // a small parquet corpus arrives as 1–2 input splits, and a
    // localCheckpoint FREEZES that partitioning — the extraction pass
    // AND every downstream stage (the index explode feeding the
    // self-join shuffle) would run on one core (measured: a 965 ms
    // single-task stage inside q33's 2.3 s). Spread the RAW docs
    // first so the extraction itself parallelizes. The spread is
    // deliberately modest: full defaultParallelism (32 here) measured
    // +0.5 s of per-stage task overhead on the LIGHT consumers
    // (q80/q144, whose probe-join stages hold ~1 MB each) while 8-way
    // keeps the q33/q157 self-join win intact. Only the toy/bench
    // regime ever takes this branch — a cluster-scale scan has more
    // splits than this floor and passes through untouched.
    val target = math.min(8, docs.sparkSession.sparkContext.defaultParallelism)
    val spread =
      if (docs.queryExecution.toRdd.getNumPartitions < target)
        docs.repartition(target)
      else docs
    spread.select((col("doc_id") +:
        graft.expressions.ShingleHash64(col("text")).as("hs") +: extra): _*)
      .localCheckpoint()
  }

  /** Exploded (doc_id, h[, extra…]) view of [[shingleArrays]] output. */
  private def explodeShingles(arr: DataFrame): DataFrame = {
    val keep = arr.columns.filter(_ != "hs").map(col)
    arr.select((keep :+ explode(col("hs")).as("h")): _*)
  }

  /** [[shingleArrays]] (no extras) memoized per corpus via
    * [[graft.AnnSubstrate]] — the within-query checkpoint promoted to a
    * cross-query substrate, the nearDupPairsShared contract: the four
    * registered inverted-index consumers (q33/q157/q80/q144) extract
    * the identical per-doc hash arrays and each used to re-run the
    * compiled extraction pass per query. Extras stay per-consumer:
    * every rider in the tree is a pure function of doc_id (q80's split
    * tag), so it derives ON the checkpointed frame without a join. */
  private def shingleArraysShared(docs: DataFrame,
      corpusKey: Option[String]): DataFrame =
    corpusKey match {
      case Some(ck) => graft.AnnSubstrate.getOrBuildFrames(docs.sparkSession,
        s"shinglearrays|$ck")(shingleArrays(docs))(Seq(_))
      case None => shingleArrays(docs)
    }

  /** The cross-document boilerplate set: 64-bit hashes of every word-
    * 3-gram occurring in >= 2 distinct documents (per-doc distinctness
    * comes from the compiled expression, so the count IS document
    * frequency). One definition shared by the exposure accounting (q107)
    * and the span-removal transform (q110) — the report and the
    * transform can never disagree about what counts as boilerplate.
    * |vocab|-bounded: small enough to broadcast at any corpus size the
    * 3-gram space allows; q106 is the text-emitting audit twin. */
  private def boilerplateHashes(docs: DataFrame): DataFrame =
    docs.select(explode(graft.expressions.ShingleHash64(col("text"), 3)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("h"))

  /** [[boilerplateHashes]] memoized per corpus (|vocab|-bounded, tiny
    * checkpoint): q107's accounting and q110's removal transform read
    * the identical df>=2 blacklist. */
  private def boilerplateHashesShared(docs: DataFrame,
      corpusKey: Option[String]): DataFrame =
    corpusKey match {
      case Some(ck) => graft.AnnSubstrate.getOrBuildFrames(docs.sparkSession,
        s"boilerplate|$ck")(
          boilerplateHashes(docs).localCheckpoint(true))(Seq(_))
      case None => boilerplateHashes(docs)
    }

  /** Exact dedup: keep the lowest doc_id per normalized-content
    * fingerprint, count copies. */
  def exactDedup(docs: DataFrame): DataFrame =
    exactDedupFromFp(
      docs.select(fingerprint(col("text")).as("fp"), col("doc_id")))

  /** The same keeper election over a PRE-fingerprinted (fp, doc_id)
    * frame — for callers whose existing corpus scan already carries the
    * fingerprint (q170 rides it on its token-count scan so the replan
    * costs ONE corpus pass, not two). Split out rather than duplicated
    * at the call site so there stays exactly one definition of "keeper"
    * (min doc_id per fp). */
  def exactDedupFromFp(fped: DataFrame): DataFrame =
    fped.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Passage-level exact dedup (the C4/RefinedWeb recipe applied at
    * sub-document granularity): split each document into fixed
    * `chunkWords`-word chunks, drop every chunk whose exact text occurs
    * elsewhere in the corpus under an earlier (doc_id, chunk_idx), and
    * reassemble each document from its surviving chunks.
    *
    * Scale shape: chunks are md5-hashed IN PLACE before the explode, so
    * the claim shuffle carries (doc_id, idx, 32-char hash) — never chunk
    * text — with map-side combine on the hash; the winners then collapse
    * to one small int-array per surviving doc, and document text moves
    * through exactly one join keyed by doc_id, where the kept chunks are
    * re-sliced from the original words. Output per doc: chunk counts and
    * the deduplicated text (empty string when every passage was claimed
    * by an earlier document). */
  def chunkDedup(docs: DataFrame, chunkWords: Int = 8): DataFrame = {
    val arr = split(col("text"), " ")
    val nChunks = ceil(size(arr) / lit(chunkWords.toDouble)).cast("int")
    val sliceAt = (words: Column, i: Column) =>
      concat_ws(" ", slice(words, i * chunkWords + 1, lit(chunkWords)))
    val chunked = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nChunks - 1), i => md5(sliceAt(arr, i))))
        .as(Seq("chunk_idx", "h")))
    val kept = chunked
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("w"))
      .groupBy(col("w.doc_id").as("doc_id"))
      .agg(sort_array(collect_list(col("w.chunk_idx"))).as("kept"))
    // coalesce: a NULL-text doc has no chunks at all — report a coherent
    // (0, 0, "") row rather than (NULL, 0, "")
    docs.select(col("doc_id"), arr.as("arr"),
        coalesce(nChunks.cast("long"), lit(0L)).as("n_chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(size(col("kept")), lit(0)).cast("long").as("n_kept"),
        concat_ws(" ", transform(coalesce(col("kept"), array().cast("array<int>")),
          i => sliceAt(col("arr"), i))).as("dedup_text"))
  }

  /** Connected components over candidate duplicate pairs (`d1`, `d2`) —
    * the stage that turns pairwise near-dup hits into dedup GROUPS with
    * one canonical survivor each. Iterative min-label propagation: every
    * vertex starts as its own label and repeatedly adopts the smallest
    * label among itself and its neighbors, so each component converges to
    * its minimum vertex id. Iterations are one equi-join + one groupBy
    * each, and the labels frame is `localCheckpoint`ed per round to keep
    * lineage flat (the IVF lesson). Convergence is detected by the sum of
    * labels (strictly decreasing until fixpoint), checked on the driver.
    * The checkpoint is LAZY (`eager = false`): the convergence-sum action
    * both materializes the round's checkpoint and returns the sum, so
    * each round costs exactly ONE Spark job — the eager form ran two
    * (checkpoint materialization, then the sum scan) and at toy scale
    * the per-round driver round-trips dominated q81's wall-clock.
    *
    * Dedup components are near-cliques from LSH/fingerprint buckets, so
    * diameters are tiny and this converges in 2-3 rounds; a web-scale
    * general graph would want the large-star/small-star variant instead
    * (same join-per-round shape, fewer rounds on long chains). Returns
    * (`doc_id`, `component`). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // checkpoint the edge list too: it is re-joined every iteration, and
    // pairs is typically itself an expensive self-join (q69)
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint()
    // coalesce guards the empty-graph case: sum over zero rows is NULL
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("component")), lit(0L))).head().getLong(0)
    var labels = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("component")).localCheckpoint(eager = false)
    var lastSum = labelSum(labels)
    var iter = 0
    var converged = labels.isEmpty
    while (iter < maxIters && !converged) {
      val pushed = edges.join(labels, edges("src") === labels("v"))
        .select(col("dst").as("v"), col("component"))
      labels = labels.union(pushed)
        .groupBy(col("v")).agg(min(col("component")).as("component"))
        .localCheckpoint(eager = false)
      val s = labelSum(labels)
      converged = s == lastSum
      lastSum = s
      iter += 1
    }
    // fail LOUD: an unconverged label set silently mislabels components
    // (a chain of diameter > maxIters still carries intermediate labels).
    // Dedup graphs converge in 2-3 rounds; hitting this means the input
    // is not a dedup-shaped graph — raise maxIters deliberately.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters iterations; " +
        "raise maxIters (component diameter exceeds it)")
    labels.select(col("v").as("doc_id"), col("component"))
  }

  /** Shared overlap core for every inverted-index resemblance measure:
    * self-join `interIndex` on the shingle hash for intersection counts,
    * then per-doc set sizes from `sizes` (doc_id, n — derived shuffle-
    * free from the checkpointed shingle arrays via [[sizesFromArrays]],
    * the FULL index so the union denominator keeps every shingle) — ONE
    * definition for the capped, uncapped, jaccard (q33), and containment
    * (q157) paths (a scoring change landing in only one would silently
    * break DedupScaleSpec's cut-inertness byte-identity). Returns
    * (d1, d2, inter, n1, n2); callers project their measure. */
  private def pairOverlap(sizes: DataFrame, interIndex: DataFrame): DataFrame = {
    val inter = interIndex.as("a").join(interIndex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
  }

  /** Per-doc distinct-shingle set sizes read straight off the stored
    * array lengths — ShingleHash64 emits per-doc DISTINCT hashes, so
    * size(hs) IS the set size: no explode, no |shingles|-row groupBy
    * shuffle (the round-9 shape paid one per query). */
  private def sizesFromArrays(arr: DataFrame): DataFrame =
    arr.select(col("doc_id"), size(col("hs")).cast("bigint").as("n"))

  private def jaccardScored(
      sizes: DataFrame, interIndex: DataFrame, threshold: Double): DataFrame =
    pairOverlap(sizes, interIndex)
      .withColumn("jaccard",
        col("inter") * lit(1.0d) / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))

  /** The document-frequency stop-term cut shared by q33 and q157: drop
    * hot shingles (df > maxDocFreq) from the INTERSECTION side only —
    * the hot tail is broadcast-size by construction. */
  private def dfCut(ex: DataFrame, maxDocFreq: Int): DataFrame = {
    val hot = ex.groupBy(col("h")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select(col("h"))
    ex.join(broadcast(hot), Seq("h"), "left_anti")
  }

  /** Near-duplicate pairs by n-gram Jaccard ≥ threshold, via the
    * inverted-index join on hashed shingles (only co-shingle pairs are
    * ever scored; the shuffle key is an 8-byte long). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // the round-9 shape re-ran the shingle extraction once per plan
    // branch (both join sides + sizes — different shuffle keys, so no
    // exchange reuse applies); the checkpointed array substrate runs it
    // once and reads sizes off the array lengths (see shingleArrays)
    val arr = shingleArrays(docs)
    jaccardScored(sizesFromArrays(arr), explodeShingles(arr), threshold)
  }

  /** [[ngramJaccardPairs]] with a DOCUMENT-FREQUENCY cut — the inverted
    * index's superlinearity guard, the q33 counterpart of the banded
    * family's hot-bucket cap: a shingle appearing in F documents fans
    * out F² pair rows, so one stopword-like shingle (boilerplate
    * phrase, navigation chrome) makes the index join quadratic at any
    * corpus size. Shingles with df > `maxDocFreq` are dropped from the
    * INTERSECTION counting only — the standard prefix-filter/stop-term
    * cut from the set-similarity-join literature — while per-doc sizes
    * (the union denominator) keep every shingle, so a surviving pair's
    * jaccard is exact whenever its overlap holds no hot shingle, and
    * UNDERESTIMATED (never inflated) otherwise: the cut can only lose
    * pairs whose overlap is mostly corpus-wide boilerplate — precisely
    * the pairs a near-dup pass should not fire on. DedupScaleSpec pins
    * the linear bound on a hot-shingle corpus and cut-inertness when no
    * shingle exceeds the threshold. */
  def ngramJaccardPairsCapped(
      docs: DataFrame, threshold: Double, maxDocFreq: Int,
      corpusKey: Option[String] = None): DataFrame = {
    val arr = shingleArraysShared(docs, corpusKey)
    // df per shingle hash is one map-side-combined agg, but only the HOT
    // tail matters: hashes with df > maxDocFreq number at most
    // |index|/maxDocFreq — broadcast-size at any corpus size, usually
    // empty — so the cut is a broadcast ANTI join, not a co-partitioned
    // join of the full index against its (nearly-as-large) rare subset.
    jaccardScored(sizesFromArrays(arr),
      dfCut(explodeShingles(arr), maxDocFreq), threshold)
  }

  /** q157: containment pairs — Broder's asymmetric resemblance
    * C = |A∩B| / min(|A|,|B|) over the df-cut inverted index, with the
    * symmetric jaccard alongside and a partial-containment flag. */
  def containmentPairs(docs: DataFrame, minContain: Double,
      maxDocFreq: Int = DefaultMaxDocFreq,
      corpusKey: Option[String] = None): DataFrame = {
    val arr = shingleArraysShared(docs, corpusKey)
    pairOverlap(sizesFromArrays(arr),
        dfCut(explodeShingles(arr), maxDocFreq))
      .withColumn("containment",
        col("inter") * lit(1.0d) / least(col("n1"), col("n2")))
      .withColumn("jaccard",
        col("inter") * lit(1.0d) / (col("n1") + col("n2") - col("inter")))
      .filter(col("containment") >= minContain)
      .select(col("d1"), col("d2"),
        col("n1").cast("bigint").as("n1"), col("n2").cast("bigint").as("n2"),
        col("containment"), col("jaccard"),
        (col("containment") - col("jaccard") >= lit(0.1d)).as("partial"))
      .orderBy(col("d1"), col("d2"))
  }

  /** MinHash signatures, one row per doc with a k-element signature
    * array — computed per-row by [[graft.expressions.MinHashSig]]: no
    * explode, no shuffle; signature construction is embarrassingly
    * parallel, exactly what you want at 100 TB. */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.expressions.MinHashSig(col("text"), k).as("sig"))

  /** [[minhashSignatures]] memoized per (corpus, k) and checkpointed —
    * q34's band join, q143's calibration, and q166's planner all derive
    * from the identical compiled-MinHashSig pass. */
  private def minhashSignaturesShared(docs: DataFrame, k: Int,
      corpusKey: Option[String]): DataFrame =
    corpusKey match {
      case Some(ck) => graft.AnnSubstrate.getOrBuildFrames(docs.sparkSession,
        s"minhashsigs|$ck|$k")(
          minhashSignatures(docs, k).localCheckpoint())(Seq(_))
      case None => minhashSignatures(docs, k)
    }

  /** MinHash calibration table (q143): for the banded candidate pairs,
    * the estimator (signature agreement fraction) against the TRUE
    * distinct-3-gram-shingle Jaccard, bucketed by agreement count —
    * the table that tells a dedup operator what an "agreeing" signature
    * actually MEANS at k = 8 (estimator standard error ≈ 1/√k ≈ 0.35,
    * so the measured per-bucket bias/error is large and worth knowing
    * before picking a drop threshold; the production fix is raising k,
    * and this query is how the k-vs-error trade gets measured).
    *
    * Scale: the pair population is the capped banded candidate set
    * (never all pairs); signatures ship as k md5 strings per doc; the
    * true-Jaccard leg joins each pair against d1's distinct shingle
    * hashes then probes d2's — |pairs|·S̄ shuffled 8-byte rows, the
    * q33 inverted-probe shape restricted to candidates. */
  def minhashCalibration(docs: DataFrame, k: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    // ONE compiled-MinHashSig pass feeds both the band join and the
    // agreement count (a second pass measured ~1 s of the query's cost);
    // keyed, it is the cross-query shared table
    val sigs = corpusKey match {
      case Some(_) => minhashSignaturesShared(docs, k, corpusKey)
      case None => minhashSignatures(docs, k).localCheckpoint()
    }
    val withSig = minhashCappedFromBands(
        minhashBandsFromSigs(sigs, k, 2), maxBucket)
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), Seq("d1"))
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        aggregate(
          zip_with(col("sig1"), col("sig2"), (a, b) => (a === b).cast("int")),
          lit(0), (acc, x) => acc + x).as("n_agree"))
    // ShingleHash64 emits DISTINCT hashes (its default contract), so the
    // exploded rows are already the set representation Jaccard needs
    val sh = docs.select(col("doc_id"),
      explode(graft.expressions.ShingleHash64(col("text"), 3)).as("h"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = withSig.select(col("d1"), col("d2"))
      .join(sh.select(col("doc_id").as("d1"), col("h")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("h")), Seq("d2", "h"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ni"))
    val ni = coalesce(col("ni"), lit(0L))
    val j = withSig
      .join(inter, Seq("d1", "d2"), "left")
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .select(col("n_agree"),
        (col("n_agree").cast("double") / lit(k)).as("est_jaccard"),
        (ni.cast("double") / (col("n1") + col("n2") - ni).cast("double"))
          .as("tj"))
    j.groupBy(col("n_agree"), col("est_jaccard"))
      .agg(count(lit(1)).as("n_pairs"),
        graft.functions.DetAgg.davg(col("tj")).as("avg_true_jaccard"),
        graft.functions.DetAgg.davg(abs(col("est_jaccard") - col("tj")))
          .as("avg_abs_err"))
      .orderBy(col("n_agree"))
  }

  /** (doc_id, band, sig) band rows — ONE definition for the capped and
    * uncapped candidate paths (a banding change that landed in only one
    * would silently break DedupScaleSpec's cap-inertness byte-identity). */
  private def minhashBands(docs: DataFrame, k: Int, rowsPerBand: Int): DataFrame =
    minhashBandsFromSigs(minhashSignatures(docs, k), k, rowsPerBand)

  /** Band derivation over a prebuilt (doc_id, sig) signature frame. */
  private def minhashBandsFromSigs(
      sigs: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** LSH candidate pairs: documents agreeing on at least one band of
    * `rowsPerBand` consecutive minhashes (k/rowsPerBand bands). The
    * bucket join key is (band, concatenated band signature). */
  def minhashCandidates(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
      corpusKey: Option[String] = None): DataFrame = {
    val bands = minhashBandsFromSigs(
      minhashSignaturesShared(docs, k, corpusKey), k, rowsPerBand)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** SimHash-banded near-dup pairs: the 64-bit signature (per-row
    * codegen'd expression, no shuffle) splits into four 16-bit bands;
    * documents agreeing on at least one band are candidates (pigeonhole:
    * every pair within hamming ≤ 3 is guaranteed caught, and in practice
    * most near-dups far beyond that), then the exact 64-bit hamming
    * distance re-ranks candidates and keeps pairs ≤ `maxHamming`.
    *
    * Scale: the candidate join keys on (band, 16-bit value) — |docs|×4
    * rows with constant-size keys, never all pairs; random-pair collision
    * odds are 2⁻¹⁶ per band. Complements q33 (shingle inverted index,
    * keys grow with text) and q34 (MinHash bands, set similarity): this
    * one costs a single long per document and ranks by BIT distance. */
  /** The 4×16-bit band explosion over a (doc_id, sig, ...) frame — ONE
    * definition shared by q76 and q97, mirroring the oracle side's shared
    * SimhashBandCte, so the two Spark paths cannot drift either. Keeps
    * every other input column alongside (doc_id, sig, band, bv). */
  private[graft] def simhashBands(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), 16 * b).bitwiseAND(lit(0xffffL)).as("bv"))
    }
    sigs.select(col("*"), explode(array(bandCols: _*)).as("bs"))
      .withColumn("band", col("bs.band"))
      .withColumn("bv", col("bs.bv"))
      .drop("bs")
  }

  /** Materialized (doc_id, sig) simhash table — shared by the capped and
    * uncapped pair paths. localCheckpoint: both self-join branches would
    * otherwise re-scan the text and re-run the per-token md5 pipeline
    * (the broadcast side gets no exchange reuse). The signature table is
    * 16 bytes/doc — the thing a production pipeline would persist anyway
    * — so materializing it once halves the query's dominant cost
    * (measured 1.7→~0.9 s at sf0.1). */
  private[graft] def simhashSigs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.expressions.SimHash64(graft.expressions.Md5TokenHash64.words(col("text"))).as("sig"))
      .localCheckpoint()

  /** Shared verify tail: dedup multi-band agreements, exact 64-bit
    * hamming cut — one definition for the capped and uncapped paths
    * (and for [[Multimodal]]'s payload-level simhash twin). */
  private[graft] def hammingVerified(cands: DataFrame, maxHamming: Int): DataFrame =
    cands
      .distinct() // a pair may agree on several bands — count it once
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** Banded candidate pairs from a (doc_id, sig, band, bv) frame — ONE
    * definition of the self-join convention (band/bv equality, d1 < d2,
    * s1/s2 projection) shared by the uncapped path here and
    * [[Multimodal.payloadSimhashPairs]]; a convention change landing in
    * only one caller would silently desynchronize the engines. */
  private[graft] def bandCandidatePairs(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sig").as("s1"), col("b.sig").as("s2"))

  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int): DataFrame =
    hammingVerified(bandCandidatePairs(simhashBands(simhashSigs(docs))), maxHamming)

  /** The full near-dup dedup pipeline, end to end: simhash signatures →
    * banded candidates → exact-hamming pairs → connected components →
    * one canonical SURVIVOR per cluster (longest text, ties to the
    * smallest doc_id — the doc a dedup pass would keep). Every stage is
    * the scale-safe variant: per-row signatures, constant-key band join,
    * iterative min-label components; survivor selection is a single
    * max_by aggregate over (n_chars, -doc_id), no window sort. */
  def nearDupSurvivors(docs: DataFrame, maxHamming: Int,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    nearDupComponentsShared(docs, maxHamming, maxBucket, corpusKey)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"),
        max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
          .as("survivor"))
  }

  /** q154: near-dup survivor election by QUALITY (type-token ratio, the
    * q105 gate's richness signal) compared against q81's by-length rule —
    * per cluster, both winners and whether the election flips. */
  def qualitySurvivors(docs: DataFrame, maxHamming: Int,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    val scored = docs.select(col("doc_id"), col("n_chars"),
      (size(array_distinct(wsTokens(lower(col("text"))))).cast("double")
        / size(wsTokens(col("text")))).as("ttr"))
    nearDupComponentsShared(docs, maxHamming, maxBucket, corpusKey)
      .join(scored, Seq("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).cast("bigint").as("n_members"),
        max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id")))
          .as("survivor_len"),
        max_by(col("doc_id"), struct(col("ttr"), -col("doc_id")))
          .as("survivor_ttr"))
      .select(col("component"), col("n_members"), col("survivor_len"),
        col("survivor_ttr"),
        (col("survivor_len") =!= col("survivor_ttr")).as("flipped"))
      .orderBy(col("component"))
  }

  /** q156: the dataset datasheet — one (metric, value) row per headline
    * number a data card quotes, each recomputed from its family's single
    * source of truth (gateFlags, capped simhash pairs, template prefixes). */
  def datasetDatasheet(docs: DataFrame,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    def rows(src: DataFrame)(pairs: (String, Column)*): DataFrame =
      src.select(explode(array(pairs.map { case (m, v) =>
          struct(lit(m).as("metric"), v.cast("double").as("value")) }: _*))
        .as("r"))
        .select(col("r.metric").as("metric"), col("r.value").as("value"))
    val t = docs
      .select(size(wsTokens(col("text"))).cast("long").as("nt"),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
    val tRows = rows(t)(
      "n_docs" -> col("n_docs"), "n_tokens" -> col("n_tokens"),
      "n_langs" -> col("n_langs"), "n_sources" -> col("n_sources"),
      "mean_tokens_per_doc" ->
        (col("n_tokens").cast("double") / col("n_docs").cast("double")))
    val v = docs.select(explode(wsTokens(lower(col("text")))).as("w"))
      .agg(countDistinct(xxhash64(col("w"))).as("vocab"))
    val fl = TextAnalysis.gateFlags(docs)
      .agg(sum(when(col("f_short") || col("f_low_ttr") || col("f_bad_len")
        || col("f_dup"), 1L).otherwise(0L)).as("flagged"))
    // both endpoints in ONE pass over the pair table — a union of two
    // selects would replicate the whole banded-join subtree (plan-pin
    // catch, r9)
    val nd = nearDupPairsShared(docs, maxHamming = 8, maxBucket, corpusKey)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
      .agg(count(lit(1)).as("members"))
    val tpl = docs.groupBy(substring(col("text"), 1, 80))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .agg(coalesce(sum(col("n")), lit(0L)).as("tdocs"))
    tRows
      .unionByName(rows(v)("vocab_size" -> col("vocab")))
      .unionByName(rows(fl)("flagged_docs" -> col("flagged")))
      .unionByName(rows(nd)("neardup_member_docs" -> col("members")))
      .unionByName(rows(tpl)("template_docs" -> col("tdocs")))
      .orderBy(col("metric"))
  }

  /** Quality×duplication lift (q127): for each q105 gate reason, the
    * near-dup membership rate (any simhash hamming ≤ `maxHamming` pair)
    * among flagged vs clean docs, with the lift ratio. Flags come from
    * [[TextAnalysis.gateFlags]] — the SAME definition q105 reports — so
    * the cross-signal monitor cannot drift from the gate it explains. */
  def qualityDupLift(docs: DataFrame, maxHamming: Int,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    val pairs = nearDupPairsShared(docs, maxHamming, maxBucket, corpusKey)
      .select(col("d1"), col("d2"))
    val members = pairs.select(col("d1").as("doc_id"))
      .union(pairs.select(col("d2").as("doc_id"))).distinct()
    val flagged = TextAnalysis.gateFlags(docs)
      .join(members.withColumn("is_dup", lit(true)), Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
    val reasons = Seq("f_short" -> "short", "f_low_ttr" -> "low_ttr",
      "f_bad_len" -> "bad_len", "f_dup" -> "dup_3gram")
    val unp = flagged.select(col("is_dup"),
        explode(array(reasons.map { case (c, n) =>
          struct(lit(n).as("reason"), col(c).as("flag")) }: _*)).as("r"))
      .select(col("r.reason").as("reason"), col("r.flag").as("flag"), col("is_dup"))
    val a = unp.groupBy(col("reason")).agg(
      sum(when(col("flag"), 1L).otherwise(0L)).cast("bigint").as("n_flagged"),
      sum(when(col("flag") && col("is_dup"), 1L).otherwise(0L)).cast("bigint")
        .as("dup_flagged"),
      sum(when(!col("flag"), 1L).otherwise(0L)).cast("bigint").as("n_clean"),
      sum(when(!col("flag") && col("is_dup"), 1L).otherwise(0L)).cast("bigint")
        .as("dup_clean"))
    val rateF = col("dup_flagged").cast("double") / col("n_flagged").cast("double")
    val rateC = col("dup_clean").cast("double") / col("n_clean").cast("double")
    a.select(col("reason"), col("n_flagged"), col("dup_flagged"),
        col("n_clean"), col("dup_clean"),
        when(col("n_flagged") > 0, rateF).as("rate_flagged"),
        when(col("n_clean") > 0, rateC).as("rate_clean"),
        when(col("n_flagged") > 0 && col("dup_clean") > 0, rateF / rateC).as("lift"))
      .orderBy(col("reason"))
  }

  // ------------------------------------------------------------------
  // Hot-bucket cap: the superlinearity guard for the banded LSH family.
  //
  // The band joins above cost Σ_buckets B² candidate pairs — corpus SIZE
  // doesn't make them quadratic, bucket DENSITY does. A pathological
  // corpus (boilerplate mass, a mirrored site, near-identical template
  // pages) can put B = millions of documents into ONE bucket, and the
  // self-join goes quadratic exactly where the near-dup mass is. The
  // guard: a bucket above `maxBucket` switches from all-pairs to a STAR
  // around its min-doc_id hub — B−1 candidate edges instead of B(B−1)/2,
  // linear per bucket — while the bucket stays CONNECTED for the
  // components/survivor path (a mega-bucket IS the near-identical mass
  // dedup exists to collapse). Every star edge is still a genuine band
  // agreement and still passes the exact downstream verification
  // (hamming cut / signature re-rank), so capped output never contains a
  // false pair. What the cap gives up is pair ENUMERATION inside hot
  // buckets: two hot-bucket members that BOTH fail verification against
  // the hub lose their direct edge (for a 16-bit simhash band that means
  // docs agreeing in one band yet >maxHamming from the hub — possible,
  // rare, and exactly the population a mega-bucket makes ambiguous
  // anyway). The uncapped forms remain the oracle/pair-set semantics;
  // the capped forms are what a 100 TB dedup run ships with.

  /** The tiny HOT-bucket table: (keys..., _n, _hub) for buckets whose
    * membership exceeds `maxBucket` — by construction at most
    * |bands|/maxBucket rows, i.e. broadcast-size at ANY corpus size, and
    * empty on a healthy corpus. One map-side-combined aggregate; the
    * min-struct hub is the star center. (A window formulation was
    * measured first and rejected: it shuffles AND sorts the full band
    * table to annotate every row with stats only hot rows need —
    * +60 % on q81's wall-clock for information that fits in a broadcast.) */
  private def hotBuckets(
      bands: DataFrame, keys: Seq[String], hubCols: Seq[String],
      maxBucket: Int): DataFrame =
    bands.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        min(struct(hubCols.map(col): _*)).as("_hub"))
      .filter(col("_n") > maxBucket)

  /** [[simhashNearDupPairs]] with the hot-bucket cap. Identical output
    * columns; buckets of size ≤ `maxBucket` enumerate all pairs exactly
    * as the uncapped form, larger buckets contribute hub-star edges
    * only. The cap costs one map-side-combined agg plus a broadcast
    * left join that marks each band row hot/cool — no extra shuffle or
    * sort of the band table. DedupScaleSpec pins: linear growth on a
    * one-hot-bucket corpus, byte-identical output when no bucket
    * exceeds the cap, and an unchanged survivor set for the
    * near-identical mass. */
  def simhashNearDupPairsCapped(
      docs: DataFrame, maxHamming: Int, maxBucket: Int): DataFrame =
    simhashNearDupPairsCappedFromSigs(simhashSigs(docs), maxHamming, maxBucket)

  /** The SHARED capped pair table — [[simhashNearDupPairsCapped]]
    * memoized per (corpus, maxHamming, maxBucket) via
    * [[graft.AnnSubstrate]] when `corpusKey` names the corpus (the
    * registered queries pass the testdata path). Nine registered
    * queries (q76/q81/q117/q127/q141/q154/q156/q161/q162, plus q174's
    * lexical leg) consume the IDENTICAL (docs, 8, 1000) pair set and
    * each used to re-run the signature scan + band self-join + xor
    * verify per query; production persists the pair table of a corpus
    * snapshot once — DatasheetStateStream's persisted-signature read is
    * the streaming twin of this memo. Without a key: a fresh build,
    * pure function (tests, ad-hoc frames, split-tagged sub-corpora). */
  private[graft] def nearDupPairsShared(docs: DataFrame, maxHamming: Int,
      maxBucket: Int, corpusKey: Option[String] = None): DataFrame =
    corpusKey match {
      case Some(ck) =>
        // ONE signature scan + band join per (corpus, maxBucket):
        // candidate generation is independent of maxHamming (the cut
        // is a pure post-filter in hammingVerified, and hamming of a
        // 64-bit sig never exceeds 64), so pairs(h) == pairs(64)
        // WHERE hamming <= h exactly — without this, q117's uncut
        // curve and the 8-cut family each paid their own corpus pass.
        // The cut still gets its OWN small checkpoint: at sf0.1 the
        // uncut table is 10x the <=8 one (188k vs 18k rows), so
        // pointing the seven 8-cut consumers at the big table taxed
        // every run (measured +0.1-0.2 s/query) for a once-per-session
        // saving — derive-and-checkpoint keeps both properties
        def uncut = graft.AnnSubstrate.getOrBuildFrames(docs.sparkSession,
          s"simhashpairs|$ck|64|$maxBucket")(
            simhashNearDupPairsCapped(docs, 64, maxBucket)
              .localCheckpoint(true))(Seq(_))
        if (maxHamming >= 64) uncut
        else graft.AnnSubstrate.getOrBuildFrames(docs.sparkSession,
          s"simhashpairs|$ck|$maxHamming|$maxBucket")(
            uncut.filter(col("hamming") <= maxHamming)
              .localCheckpoint(true))(Seq(_))
      case None => simhashNearDupPairsCapped(docs, maxHamming, maxBucket)
    }

  /** The SHARED component labeling of the pair graph — q81 and q154 run
    * [[connectedComponents]] over the identical pair set (q154 is q81's
    * clusters under a different election); the iterative min-label
    * chain is the bench's single most expensive stage, so it runs once
    * per (corpus, maxHamming, maxBucket) key. Same memo contract as
    * [[nearDupPairsShared]]. */
  private[graft] def nearDupComponentsShared(docs: DataFrame, maxHamming: Int,
      maxBucket: Int, corpusKey: Option[String] = None): DataFrame = {
    def build() = connectedComponents(
      nearDupPairsShared(docs, maxHamming, maxBucket, corpusKey)
        .select(col("d1"), col("d2")))
    corpusKey match {
      case Some(ck) => graft.AnnSubstrate.getOrBuildFrames(docs.sparkSession,
        s"simhashcomponents|$ck|$maxHamming|$maxBucket")(
          build().localCheckpoint(true))(Seq(_))
      case None => build()
    }
  }

  /** The capped pair stage over a PREBUILT (doc_id, sig) table — split
    * out so consumers that already hold persisted signatures (the
    * datasheet-from-state read in
    * [[graft.streaming.DatasheetStateStream]]) derive pairs from 16
    * bytes/doc of state without rescanning text. [[simhashSigs]] is the
    * only other producer of that shape, so batch and state-served pairs
    * share one banding/cap/verify definition. */
  private[graft] def simhashNearDupPairsCappedFromSigs(
      sigs: DataFrame, maxHamming: Int, maxBucket: Int): DataFrame = {
    val bands = simhashBands(sigs)
    val hot = hotBuckets(bands, Seq("band", "bv"), Seq("doc_id", "sig"), maxBucket)
    val marked = bands.join(broadcast(hot), Seq("band", "bv"), "left")
    val cool = marked.filter(col("_n").isNull)
    val coolPairs = cool.as("a").join(cool.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sig").as("s1"), col("b.sig").as("s2"))
    val hotStars = marked
      .filter(col("_n").isNotNull && col("doc_id") =!= col("_hub.doc_id"))
      .select(col("_hub.doc_id").as("d1"), col("doc_id").as("d2"),
        col("_hub.sig").as("s1"), col("sig").as("s2"))
    hammingVerified(coolPairs.union(hotStars), maxHamming)
  }

  /** [[minhashCandidates]] with the hot-bucket cap; same output columns,
    * same trade as [[simhashNearDupPairsCapped]] (candidates here feed an
    * exact re-rank or the components path, so star edges preserve the
    * dedup outcome while bounding the join). */
  def minhashCandidatesCapped(
      docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2, maxBucket: Int): DataFrame =
    minhashCappedFromBands(minhashBands(docs, k, rowsPerBand), maxBucket)

  /** The capped band self-join over a prebuilt (doc_id, band, sig) frame —
    * split out so callers that already hold the signature table (q143's
    * calibration joins signatures anyway) can derive candidates from it
    * without a second compiled-MinHashSig pass over the corpus. */
  private def minhashCappedFromBands(
      bands: DataFrame, maxBucket: Int): DataFrame = {
    val hot = hotBuckets(bands, Seq("band", "sig"), Seq("doc_id"), maxBucket)
    val marked = bands.join(broadcast(hot), Seq("band", "sig"), "left")
    val cool = marked.filter(col("_n").isNull)
    val coolPairs = cool.as("a").join(cool.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val hotStars = marked
      .filter(col("_n").isNotNull && col("doc_id") =!= col("_hub.doc_id"))
      .select(col("_hub.doc_id").as("d1"), col("doc_id").as("d2"))
    coolPairs.union(hotStars).distinct()
  }

  /** Train/test contamination check (decontamination pass): test-split
    * documents sharing at least one 3-gram shingle with ANY train-split
    * document, with the shared-shingle count and contamination rate.
    *
    * Scale: the split is the md5-bucket membership function (no split
    * table to join); the overlap is an equi-join of the test docs'
    * 8-byte shingle hashes against the DISTINCT train shingle hashes —
    * an inverted-index probe, never a doc×doc comparison. This is the
    * standard pre-training hygiene pass: report (and then drop or
    * re-bucket) eval documents the training corpus has seen. */
  def contamination(docs: DataFrame,
      corpusKey: Option[String] = None): DataFrame = {
    // split tag computed on (keyed: after) the checkpointed shingle
    // pass — a pure doc_id function, so the shared substrate needs no
    // rider baked in and no join brings it back (the round-9 shape
    // joined the exploded index against a per-doc split table)
    val base = corpusKey match {
      case Some(_) => shingleArraysShared(docs, corpusKey)
        .withColumn("split", Sampling.splitOf(col("doc_id")))
      case None =>
        shingleArrays(docs, Sampling.splitOf(col("doc_id")).as("split"))
    }
    val sh = explodeShingles(base)
    val trainSh = sh.filter(col("split") === "train").select(col("h")).distinct()
    // (doc_id, h) is already unique: ShingleHash64 emits per-doc DISTINCT
    // hashes and the split join is one row per doc — no dedup shuffle needed
    val testSh = sh.filter(col("split") === "test").select(col("doc_id"), col("h"))
    val tot = testSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = testSh.join(trainSh, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    tot.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) * lit(1.0d) / col("n_shingles"))
          .as("contamination"))
      .filter(col("n_shared") > 0)
  }

  /** Decontaminated holdout constructor (q144): the step after q80's
    * report — per source, how much of the test split SURVIVES
    * decontamination (zero 3-gram overlap with the train split) and is
    * actually usable as an eval set. A source whose clean fraction
    * collapses cannot be evaluated on (its test docs are all seen), and
    * the clean count is the denominator every eval metric on this
    * corpus should quote. Short docs with no complete shingle are
    * trivially clean (nothing measurable overlaps). Scale: q80's
    * machinery verbatim — membership is the md5-bucket function (no
    * split table), the overlap probe is the inverted-index hash join,
    * and the close is one |sources|-key aggregate. */
  def cleanHoldout(docs: DataFrame,
      corpusKey: Option[String] = None): DataFrame = {
    val testDocs = docs
      .select(col("doc_id"), col("source"),
        Sampling.splitOf(col("doc_id")).as("split"))
      .filter(col("split") === "test")
      .drop("split")
    val bad = contamination(docs, corpusKey)
      .select(col("doc_id")).withColumn("bad", lit(true))
    testDocs.join(bad, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("bad"), 1L).otherwise(0L)).cast("bigint")
          .as("n_contaminated"))
      .select(col("source"), col("n_test"), col("n_contaminated"),
        (col("n_test") - col("n_contaminated")).as("n_clean"),
        ((col("n_test") - col("n_contaminated")).cast("double") /
          col("n_test").cast("double")).as("clean_frac"))
      .orderBy(col("source"))
  }

  /** Shared DuckDB CTE prefix for the q76/q81 twins: re-derives the md5
    * simhash nibble-wise (the q35 machinery), slices the four 16-bit
    * bands, and produces the banded candidate pairs. ONE definition so
    * the two oracles cannot drift if the signature derivation ever
    * changes. NOTE: declared above `queries` — a val referenced before
    * its declaration compiles but is null at init (round-3 lesson). */
  /** Simhash derivation from a generic `th(doc_id, hx)` token-md5 table
    * to banded candidates — factored so [[Multimodal]]'s payload twin
    * (byte-chunk tokens instead of whitespace words) reuses the EXACT
    * nibble-vote/band/candidate stages and cannot drift from q76's. */
  private[graft] val SimhashFromThTail: String =
    """nib AS (
      |  SELECT doc_id, p.p AS p, CAST('0x' || substring(hx, p.p, 1) AS INTEGER) AS v
      |  FROM th CROSS JOIN (SELECT unnest(range(1, 17)) AS p) p),
      |votes AS (
      |  SELECT doc_id, p, b.b AS b,
      |    sum(CASE WHEN (v >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |  FROM nib CROSS JOIN (SELECT unnest(range(4)) AS b) b
      |  GROUP BY doc_id, p, b.b),
      |nibs AS (
      |  SELECT doc_id, p, CAST(sum(CASE WHEN vote > 0 THEN 1 << b ELSE 0 END) AS INTEGER) AS nv
      |  FROM votes GROUP BY doc_id, p),
      |bandv AS (
      |  SELECT doc_id, b.b AS band, sum(nv * (1 << (4 * ((16 - p) % 4)))) AS bv
      |  FROM nibs CROSS JOIN (SELECT unnest(range(4)) AS b) b
      |  WHERE (16 - p) // 4 = b.b GROUP BY doc_id, b.b),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM bandv a JOIN bandv b
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)""".stripMargin

  /** Exact-hamming re-rank over `cand` + `nibs` — the shared verify
    * stage, likewise reused by the payload twin. */
  private[graft] val SimhashHamTail: String =
    """,
      |ham AS (
      |  SELECT c.d1, c.d2,
      |    CAST(sum(bit_count(xor(n1.nv, n2.nv))) AS INT) AS hamming
      |  FROM cand c
      |  JOIN nibs n1 ON n1.doc_id = c.d1
      |  JOIN nibs n2 ON n2.doc_id = c.d2 AND n2.p = n1.p
      |  GROUP BY c.d1, c.d2)""".stripMargin

  private def simhashBandCteOver(docRel: String): String =
    raw"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM $docRel),
      |th AS (SELECT doc_id, substring(md5(w), 1, 16) AS hx FROM tok),
      |""".stripMargin + SimhashFromThTail

  private val SimhashBandCte: String = simhashBandCteOver("documents")

  /** Incremental near-dup (q97): only NEW arrivals probe the corpus —
    * new bands join all bands, so the candidate set is exactly the pairs
    * touching a new doc and the old × old quadrant is never recomputed.
    * The daily-ingest shape: yesterday's signature/band table is the
    * persisted state (16 bytes + 4 band keys per doc), today's delta is
    * the probe side, and cost scales with |delta| × bucket density, not
    * |corpus|². The exact-dup analogue is q65's fingerprint anti-join. */
  def incrementalNearDupPairs(docs: DataFrame, isNew: Column, maxHamming: Int): DataFrame =
    incrementalNearDupFromSigs(
      docs.select(col("doc_id"),
        graft.expressions.SimHash64(graft.expressions.Md5TokenHash64.words(col("text"))).as("sig"),
        isNew.as("is_new"))
        .localCheckpoint(), // the q76 lesson: materialize the 16-byte/doc table once
      maxHamming)

  /** The probe over a prebuilt (doc_id, sig, is_new) frame — split out so
    * the streaming corpus-state path can serve the SAME delta near-dup
    * from its persisted signature table (CorpusStateStream
    * .nearDupAgainstState) without re-deriving signatures from text. */
  private[graft] def incrementalNearDupFromSigs(
      sigs: DataFrame, maxHamming: Int): DataFrame = {
    // ONE band explosion; the probe is a FILTER of the corpus band table —
    // exactly the daily-ingest shape, where the persisted band table IS
    // the corpus side and the delta's rows are marked within it
    val corpus = simhashBands(sigs)
    val probe = corpus.filter(col("is_new"))
    probe.as("a").join(corpus.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming) // cut before the dedup exchange
      .distinct() // (new, new) pairs arrive from both probe sides; bands too
  }

  /** Cross-source shingle-overlap matrix (q96): per source pair s1 < s2,
    * the count of distinct 3-gram shingles both contain and the overlap
    * coefficient shared/min(|A|,|B|). Inverted-index join on 8-byte
    * shingle hashes — fan-out per shingle bounded by |sources|². */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    // ONE shingle pass (r18 — the q143 one-derivation convention): this
    // frame feeds THREE consumers (both self-join sides + the sizes
    // fold), and exchange reuse does not fire across their differently-
    // aliased subtrees — unmaterialized, the plan ran FOUR full corpus
    // text scans + shingle explodes (verified in the formatted plan).
    // The materialized rows are distinct (source, 8-byte hash) pairs —
    // far smaller than the text they replace.
    val sh = docs
      .select(col("source"),
        explode(graft.expressions.ShingleHash64(col("text"))).as("h"))
      .distinct()
      .localCheckpoint()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("shared_shingles"))
    pairs
      .join(broadcast(sizes.select(col("source").as("s1"), col("n").as("n1"))), Seq("s1"))
      .join(broadcast(sizes.select(col("source").as("s2"), col("n").as("n2"))), Seq("s2"))
      .select(col("s1"), col("s2"), col("shared_shingles"),
        (col("shared_shingles").cast("double") / least(col("n1"), col("n2"))).as("overlap"))
  }

  /** Cross-source near-dup matrix (q141): per normalized (source,
    * source) pair, the count of verified simhash near-dup pairs spanning
    * those sources and the distinct docs involved. Diagonal = within-
    * source template churn; off-diagonal = mirroring between sources.
    * Pairs come from the capped band machinery; tagging is two
    * |docs|-key joins of the 8-byte pair table, the matrix aggregate is
    * |sources|²-key map-side-combined. */
  def crossSourceNearDup(docs: DataFrame, maxHamming: Int,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    val tagged = nearDupPairsShared(docs, maxHamming, maxBucket, corpusKey)
      .select(col("d1"), col("d2"))
      .join(src.select(col("doc_id").as("d1"), col("source").as("src1")), Seq("d1"))
      .join(src.select(col("doc_id").as("d2"), col("source").as("src2")), Seq("d2"))
      .select(least(col("src1"), col("src2")).as("s1"),
        greatest(col("src1"), col("src2")).as("s2"),
        col("d1"), col("d2"))
    val np = tagged.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_pairs"))
    val nd = tagged
      .select(col("s1"), col("s2"), explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_docs"))
    np.join(nd, Seq("s1", "s2"))
      .select(col("s1"), col("s2"), col("n_pairs"), col("n_docs"),
        (col("s1") =!= col("s2")).as("cross_source"))
      .orderBy(col("s1"), col("s2"))
  }

  /** SimhashBandCte extended with the exact-hamming re-rank — shared by
    * the q76 and q97 oracles so the nibble-xor derivation cannot drift. */
  private val SimhashHamCte: String = SimhashBandCte + SimhashHamTail

  /** The simhash hamming CTE chain WITHOUT the leading `WITH `, for
    * oracles that compose it after other CTEs (q174's agreement table
    * prepends the k-means chain) — same text, so the derivations still
    * cannot drift. */
  private[operators] def simhashHamCtesNoWith: String =
    SimhashHamCte.stripPrefix("WITH ")

  /** q168: formatting-variant audit — how much of the exact-dup mass is
    * FORMATTING NOISE (same content after q32 normalization, different
    * raw bytes) vs true byte-identical copies. The distinction decides
    * the fix: byte dups are storage/crawl bugs (dedupe at the blob
    * layer, q133's territory); formatting variants are extraction
    * artifacts (fix the normalizer, or they reappear with every crawl).
    * Audits WHATEVER corpus it is given — on a dup-free corpus the
    * histogram is honestly empty (no group reaches 2 members); the
    * registered q168 feeds it the q32-convention fixture (original +
    * byte-identical twin + punctuation-perturbed copy, built in the
    * registration body like every sibling fixture query) so both group
    * outcomes are provably exercised at test scale. Output is the
    * (group size, raw-variant count) histogram over groups with
    * ≥ 2 members. One fingerprint-key aggregate then a ≤ |distinct
    * (n_docs, n_raw)| aggregate — the q32 plan with one extra
    * countDistinct. */
  def formattingVariants(docs: DataFrame): DataFrame = {
    docs
      .select(fingerprint(col("text")).as("fp"), md5(col("text")).as("raw"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("raw")).as("n_raw_variants"))
      .filter(col("n_docs") >= 2)
      .groupBy(col("n_docs"), col("n_raw_variants"))
      .agg(count(lit(1)).cast("bigint").as("n_groups"))
      .select(col("n_docs"), col("n_raw_variants"), col("n_groups"),
        (col("n_raw_variants") > 1).as("has_formatting_variants"))
      .orderBy(col("n_docs"), col("n_raw_variants"))
  }

  /** q161: the dedup SAVINGS curve — for every hamming threshold h in
    * [0, maxHamming], how many documents and tokens sit inside the
    * near-dup pair graph at that cutoff. This is the table a curator
    * reads to PRICE a dedup pass before running it: the q117 threshold
    * curve says where the pair-count knee is; this one converts each
    * cutoff into corpus mass (exposure, the upper bound on what a
    * survivor election could remove). Per doc the MINIMUM pair hamming
    * decides the first threshold that exposes it, so one pass over the
    * capped pair table yields the whole cumulative curve — never one
    * components run per threshold.
    *
    * Scale: the capped band join dominates (the registered q76
    * machinery); everything after is an 8-byte-key min-aggregate, a
    * |docs|-key token join, and a (maxHamming+1)-row cumulative frame.
    * All counts exact integers; fractions one IEEE division per row. */
  def dedupSavingsCurve(docs: DataFrame, maxHamming: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    val pairs = nearDupPairsShared(docs, maxHamming, maxBucket, corpusKey)
    val hmin = pairs
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"), col("hamming"))
      .groupBy(col("doc_id")).agg(min(col("hamming")).as("hmin"))
    val tok = docs.select(col("doc_id"), Sampling.nTokens(col("text")).as("nt"))
    val per = hmin.join(tok, Seq("doc_id"))
      .groupBy(col("hmin"))
      .agg(count(lit(1)).as("nd"), sum(col("nt")).cast("bigint").as("toks"))
    val tot = tok.agg(count(lit(1)).cast("bigint").as("total_docs"),
      sum(col("nt")).cast("bigint").as("total_tokens"))
    val levels = docs.sparkSession.range(0, maxHamming + 1)
      .select(col("id").cast("int").as("max_hamming"))
    levels.join(per, col("hmin") <= col("max_hamming"), "left")
      .groupBy(col("max_hamming"))
      .agg(coalesce(sum(col("nd")), lit(0L)).cast("bigint").as("docs_exposed"),
        coalesce(sum(col("toks")), lit(0L)).cast("bigint").as("tokens_exposed"))
      .crossJoin(broadcast(tot))
      .select(col("max_hamming"), col("docs_exposed"), col("tokens_exposed"),
        (col("docs_exposed").cast("double") / col("total_docs").cast("double"))
          .as("frac_docs"),
        (col("tokens_exposed").cast("double") / col("total_tokens").cast("double"))
          .as("frac_tokens"))
      .orderBy(col("max_hamming"))
  }

  /** q162: eval-leakage matrix — near-dup pairs (simhash hamming ≤
    * `maxHamming`, the registered capped stage) crossing the
    * train/val/test split boundary. q80 measures leakage as exact
    * shingle CONTAINMENT; this is its near-dup complement: a test doc
    * that is a near-duplicate of a train doc inflates eval scores even
    * when no shingle is shared verbatim. The q141 matrix shape applied
    * to the split dimension (least/greatest normalization, distinct-doc
    * counts per cell); the off-diagonal train↔test cell is the number a
    * decontamination pass must drive to zero. */
  def splitLeakageMatrix(docs: DataFrame, maxHamming: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    val pairs = nearDupPairsShared(docs, maxHamming, maxBucket, corpusKey)
      .select(col("d1"), col("d2"))
    val sp = docs.select(col("doc_id"), Sampling.splitOf(col("doc_id")).as("split"))
    val tagged = pairs
      .join(sp.select(col("doc_id").as("d1"), col("split").as("sp1")), Seq("d1"))
      .join(sp.select(col("doc_id").as("d2"), col("split").as("sp2")), Seq("d2"))
      .select(least(col("sp1"), col("sp2")).as("s1"),
        greatest(col("sp1"), col("sp2")).as("s2"), col("d1"), col("d2"))
    val np = tagged.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"))
    val nd = tagged
      .select(col("s1"), col("s2"),
        explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"))
    np.join(nd, Seq("s1", "s2"))
      .select(col("s1"), col("s2"), col("n_pairs"), col("n_docs"),
        (col("s1") =!= col("s2")).as("cross_split"))
      .orderBy(col("s1"), col("s2"))
  }

  /** q166: MinHash banding planner — for every (bands, rows-per-band)
    * factorization of the k-element signature, the MEASURED candidate
    * pair count on this corpus next to the CLOSED-FORM S-curve capture
    * probability 1−(1−s^r)^b at three reference similarities. This is
    * the table that picks the q34 operating point: more rows per band →
    * sharper threshold, fewer false candidates; the measured column
    * shows what each theoretical curve actually costs in verification
    * work here. The S-curve values are computed ONCE on the driver and
    * embedded as literals in BOTH engines' plans (no cross-engine pow()
    * parity bet — the values are the same bytes by construction).
    *
    * Scale: ONE compiled-MinHashSig pass (checkpointed, the q143
    * lesson) feeds all four band derivations; each candidate count is
    * the capped band self-join (registered-cap principle) collapsed to
    * one row. Four bounded joins over the same 16-byte/doc signature
    * table — never a corpus rescan per configuration. */
  def minhashBandPlanner(docs: DataFrame, k: Int = 8,
      maxBucket: Int = DefaultMaxBucket,
      corpusKey: Option[String] = None): DataFrame = {
    val refSims = Seq(0.3, 0.5, 0.7)
    val sigs = corpusKey match {
      case Some(_) => minhashSignaturesShared(docs, k, corpusKey)
      case None => minhashSignatures(docs, k).localCheckpoint()
    }
    Seq(1, 2, 4, 8).map { r =>
      val b = k / r
      def capture(s: Double): Double =
        1.0d - math.pow(1.0d - math.pow(s, r), b)
      minhashCappedFromBands(minhashBandsFromSigs(sigs, k, r), maxBucket)
        .agg(count(lit(1)).cast("bigint").as("n_candidate_pairs"))
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("n_candidate_pairs"),
          lit(capture(0.3)).as("p_capture_s30"),
          lit(capture(0.5)).as("p_capture_s50"),
          lit(capture(0.7)).as("p_capture_s70"))
    }.reduce(_ unionAll _).orderBy(col("rows_per_band"))
  }

  /** The q166 oracle: per configuration, the DISTINCT band-sharing pair
    * count over the q34/q143 minhash CTE machinery, with the S-curve
    * literals injected from the SAME driver-side computation the engine
    * embeds. */
  private def q166OracleSql(k: Int): String = {
    val configs = Seq(1, 2, 4, 8)
    val ctes = configs.map { r =>
      s"""bands_$r AS (
         |  SELECT doc_id, seed // $r AS band,
         |    string_agg(seed || ':' || mh, ',' ORDER BY seed || ':' || mh) AS sig
         |  FROM mh GROUP BY doc_id, band),
         |cand_$r AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT DISTINCT a.doc_id, b.doc_id
         |    FROM bands_$r a JOIN bands_$r b
         |      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id))""".stripMargin
    }.mkString(",\n")
    val rows = configs.map { r =>
      val b = k / r
      def capture(s: Double): Double =
        1.0d - math.pow(1.0d - math.pow(s, r), b)
      s"""SELECT $b AS bands, $r AS rows_per_band, n AS n_candidate_pairs,
         |  CAST(${capture(0.3)} AS DOUBLE) AS p_capture_s30,
         |  CAST(${capture(0.5)} AS DOUBLE) AS p_capture_s50,
         |  CAST(${capture(0.7)} AS DOUBLE) AS p_capture_s70
         |FROM cand_$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH ws AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
       |  FROM ws),
       |mh AS (
       |  SELECT doc_id, seed, min(md5(seed || '|' || sh)) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest(range($k)) AS seed)
       |  GROUP BY doc_id, seed),
       |$ctes
       |$rows
       |ORDER BY rows_per_band""".stripMargin
  }

  /** The [[graft.AnnSubstrate]] memo key for the registered corpus —
    * explicit path identity, the Similarity.embKey convention. */
  private def docKey(d: String): Option[String] = Some(s"$d/documents.parquet")

  /** q118's oracle SQL — shared VERBATIM with q188's state-served read,
    * so a hash match there proves the maintained df-counted shingle
    * state and a same-query split recompute are value-identical. */
  private val q118OracleSql: String = q118OracleSqlExistingWhere("")

  /** q118's chain with an optional extra predicate on the EXISTING
    * side — `""` renders the historical q118/q188 SQL byte-equal; q214
    * passes the tombstone-survivor conjunct (the arrival side stays the
    * full %10>=8 split), because forgetting existing documents shrinks
    * exactly the shingle set an ingest gate probes freshness against. */
  private def q118OracleSqlExistingWhere(existAnd: String): String =
    s"""WITH ws AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, source, unnest(list_distinct(
      |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
      |  FROM ws),
      |existing AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 < 8$existAnd),
      |arr AS (SELECT DISTINCT source, sh FROM sh WHERE doc_id % 10 >= 8)
      |SELECT a.source, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN e.sh IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(sum(CASE WHEN e.sh IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS novelty_frac
      |FROM arr a LEFT JOIN existing e ON a.sh = e.sh
      |GROUP BY a.source ORDER BY a.source""".stripMargin

  private def q214OracleSql: String = q118OracleSqlExistingWhere(
    "\n      |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '" +
      Sampling.TombstoneHex + "'")

  /** q80's oracle SQL — shared VERBATIM with q190's state-served read,
    * so a hash match there proves contamination measured against the
    * maintained train-shingle state and against a same-query split
    * recompute are value-identical. */
  private val q80OracleSql: String = q80OracleSqlTrainWhere("")

  /** q80's chain with an optional extra predicate on the TRAIN side —
    * `""` renders the historical q80/q190 SQL byte-equal; q204 passes
    * the tombstone-survivor conjunct (every tombstoned doc IS train:
    * first md5 hex 'a' < the 'cc' split boundary), because forgetting
    * training documents shrinks exactly the shingle set an eval probe
    * is checked against. */
  private def q80OracleSqlTrainWhere(trainAnd: String): String =
    s"""WITH sp AS (
       |  SELECT doc_id, text,
       |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
       |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |ws AS (SELECT doc_id, split, string_split_regex(trim(text), '\\s+') AS w FROM sp),
       |sh AS (
       |  SELECT doc_id, split, unnest(list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
       |  FROM ws),
       |train_sh AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'$trainAnd),
       |test_sh AS (SELECT doc_id, sh FROM sh WHERE split = 'test'),
       |tot AS (SELECT doc_id, count(*) AS n_shingles FROM test_sh GROUP BY doc_id),
       |hit AS (
       |  SELECT t.doc_id, count(*) AS n_shared
       |  FROM test_sh t JOIN train_sh tr ON t.sh = tr.sh GROUP BY t.doc_id)
       |SELECT tot.doc_id AS doc_id, CAST(tot.n_shingles AS BIGINT) AS n_shingles,
       |  CAST(COALESCE(hit.n_shared, 0) AS BIGINT) AS n_shared,
       |  COALESCE(hit.n_shared, 0) * 1.0 / tot.n_shingles AS contamination
       |FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
       |WHERE COALESCE(hit.n_shared, 0) > 0
       |ORDER BY tot.doc_id""".stripMargin

  private def q204OracleSql: String = q80OracleSqlTrainWhere(
    " AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '" +
      Sampling.TombstoneHex + "'")

  /** q106's oracle SQL — shared VERBATIM with q191's state-served read,
    * so a hash match there proves the maintained boilerplate blacklist
    * (additive df deltas under the ledger protocol, folded before
    * serving) and a full-corpus batch recompute are value-identical. */
  private val q106OracleSql: String = q106OracleSqlOver("documents")

  /** q106's chain over an arbitrary document relation — `"documents"`
    * renders the historical q106/q191 SQL byte-equal; q200 passes the
    * tombstone-survivor subquery, because after a document forget the
    * blacklist must equal a batch recompute over exactly the documents
    * that still exist (BOTH the per-phrase df and the n_docs
    * denominator shrink). */
  private def q106OracleSqlOver(docsRel: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $docsRel),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
       |  FROM toks),
       |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
       |nd AS (SELECT count(*) AS n_docs FROM $docsRel)
       |SELECT sh AS phrase, CAST(df AS BIGINT) AS df,
       |  CAST(df AS DOUBLE) / n_docs AS df_share
       |FROM df, nd WHERE df >= 2 ORDER BY df DESC, phrase""".stripMargin

  private def q200OracleSql: String = q106OracleSqlOver(
    "(SELECT * FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '" +
      Sampling.TombstoneHex + "')")

  /** Build-once on-disk boilerplate-blacklist state for the q191
    * state-served read: the corpus folded through BoilerplateStateStream
    * .update in two doc_id-parity waves (the additive delta-ledger
    * protocol — a replayed wave exercises the ledger fast path against
    * real state), then FOLDED to per-phrase snapshots before serving, so
    * the driver's hash gate re-proves fold neutrality for this fifth
    * delta table cross-engine every round (the q181 contract). */
  private def servedBoilerplateStateDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"bpstate|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_bp_state").toString)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val wave1 = docs.filter(col("doc_id") % 2 =!= 0)
      graft.streaming.BoilerplateStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.BoilerplateStateStream.update(dir)(wave1, 1L)
      graft.streaming.BoilerplateStateStream.update(dir)(wave1, 1L) // replay
      graft.streaming.BoilerplateStateStream.foldDeltas(s, dir)
      dir
    }

  /** Build-once FORGOTTEN boilerplate state for q200: the
    * servedBoilerplateStateDir protocol (two parity waves + a replayed
    * wave, additive ledger), then BoilerplateStateStream.forget appends
    * the tombstoned documents' contributions NEGATED as one more
    * ledger-committed batch — plus a replayed forget (ledger no-op, so
    * the hash gate also re-proves deletion idempotence) — and a final
    * fold nets deletion against accumulation BEFORE serving, so the
    * driver's gate proves the negative-delta fold neutral cross-engine,
    * not just the positive one q191 covers. */
  private[operators] def servedForgottenBpStateDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"bpforget|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_bpforget_state").toString)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      graft.streaming.BoilerplateStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.BoilerplateStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 =!= 0), 1L)
      val tomb = docs.filter(Sampling.tombstoned(col("doc_id")))
      graft.streaming.BoilerplateStateStream.forget(dir)(tomb, 2L)
      graft.streaming.BoilerplateStateStream.forget(dir)(tomb, 2L) // replay
      graft.streaming.BoilerplateStateStream.foldDeltas(s, dir)
      dir
    }

  /** Build-once on-disk corpus state holding exactly q80's TRAIN split
    * (the md5-bucket membership, Sampling.splitOf) — folded through the
    * df-counted layout's micro-batch update in two parity waves plus a
    * replayed wave, then snapshot-folded — for the q190 state-served
    * contamination read. r15 built this as the forget-free SET table;
    * serving from the df layout (membership = net df > 0,
    * value-identical — the oracle doesn't change) makes the SERVED
    * decontamination read deletion-capable as deployed, which the
    * runbook's deletion table claims of every served metric. Memoized
    * per (session, corpus); protectNew = false (the q181 contract). */
  private def servedTrainShingleStateDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"trainshdfstate|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_trainsh_state").toString)
      val train = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(Sampling.splitOf(col("doc_id")) === "train")
      val wave1 = train.filter(col("doc_id") % 2 =!= 0)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(
        train.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(wave1, 1L)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(wave1, 1L) // replay
      graft.streaming.CorpusStateStream.foldShingleDf(s, dir)
      dir
    }

  /** Build-once FORGOTTEN df-counted train-shingle state for q204: the
    * q190 fixture (q80's train split, two parity waves) folded through
    * updateShingleDf — the deletion-CAPABLE layout, +8 B/key over the
    * set table — then forgetShingleDf nets the tombstoned train docs
    * out (plus a replayed forget, ledger no-op) and foldShingleDf
    * merges the mixed-sign log before serving. */
  private[operators] def servedForgottenTrainShingleDir(s: SparkSession,
      d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"trainshforget|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_trainshforget_state").toString)
      val train = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(Sampling.splitOf(col("doc_id")) === "train")
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(
        train.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(
        train.filter(col("doc_id") % 2 =!= 0), 1L)
      val tomb = train.filter(Sampling.tombstoned(col("doc_id")))
      graft.streaming.CorpusStateStream.forgetShingleDf(dir)(tomb, 2L)
      graft.streaming.CorpusStateStream.forgetShingleDf(dir)(tomb, 2L) // replay
      graft.streaming.CorpusStateStream.foldShingleDf(s, dir)
      dir
    }

  /** Build-once on-disk df-counted shingle state holding exactly
    * q118's `existing` corpus — the doc_id%10<8 split — folded through
    * the df layout's micro-batch update (two parity waves plus a
    * replayed wave, the ledger-protocol paths), then snapshot-folded,
    * for the q188 state-served novelty read. r15 built this as the
    * forget-free SET table; the df layout (membership = net df > 0,
    * value-identical under accumulation — the oracle doesn't change)
    * makes the SERVED novelty gate deletion-capable as deployed, and
    * q214 then proves the forgotten form under the same gate. Memoized
    * per (session, corpus); protectNew = false (the q181 contract). */
  private def servedNoveltyStateDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"novdfstate|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_nov_state").toString)
      val existing = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 < 8)
      val wave1 = existing.filter(col("doc_id") % 2 =!= 0)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(
        existing.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(wave1, 1L)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(wave1, 1L) // replay
      graft.streaming.CorpusStateStream.foldShingleDf(s, dir)
      dir
    }

  /** Build-once FORGOTTEN novelty state for q214: the q188 fixture
    * (q118's `existing` split) through the df layout, then
    * forgetShingleDf nets the tombstoned existing docs out (plus a
    * replayed forget — ledger no-op) and foldShingleDf merges the
    * mixed-sign log before serving. */
  private def servedForgottenNoveltyDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"novforget|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_novforget_state").toString)
      val existing = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 10 < 8)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(
        existing.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.CorpusStateStream.updateShingleDf(dir)(
        existing.filter(col("doc_id") % 2 =!= 0), 1L)
      val tomb = existing.filter(Sampling.tombstoned(col("doc_id")))
      graft.streaming.CorpusStateStream.forgetShingleDf(dir)(tomb, 2L)
      graft.streaming.CorpusStateStream.forgetShingleDf(dir)(tomb, 2L) // replay
      graft.streaming.CorpusStateStream.foldShingleDf(s, dir)
      dir
    }

  /** q156's oracle SQL — shared VERBATIM with q181's state-served
    * read, so a hash match there proves the maintained datasheet and
    * the batch recompute are value-identical. */
  private val q156OracleSql: String = q156OracleSqlOver("documents")

  /** q156's chain over an arbitrary documents relation — `"documents"`
    * renders the historical q156/q181 SQL byte-equal; q212 passes the
    * tombstone-survivor subquery, because a forgotten datasheet must
    * quote the corpus as if the deleted documents never existed. */
  private def q156OracleSqlOver(docRel: String): String =
    simhashBandCteOver(docRel) + raw""",
        |pairs AS (
        |  SELECT c.d1, c.d2 FROM cand c
        |  JOIN nibs n1 ON n1.doc_id = c.d1
        |  JOIN nibs n2 ON n2.doc_id = c.d2 AND n2.p = n1.p
        |  GROUP BY c.d1, c.d2 HAVING sum(bit_count(xor(n1.nv, n2.nv))) <= 8),
        |members AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)),
        |dtok AS (SELECT len(string_split_regex(trim(text), '\s+')) AS nt,
        |          lang, source FROM $docRel),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(nt) AS BIGINT) AS n_tokens,
        |        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |        CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |      FROM dtok),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab
        |      FROM (SELECT unnest(string_split_regex(trim(lower(text)),
        |              '\s+')) AS w FROM $docRel)),
        |fl AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) < 20 AS f_short,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) < CAST(0.32 AS DOUBLE) AS f_low_ttr,
        |    (CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |       / len(string_split_regex(trim(text), '\s+')) < CAST(4.0 AS DOUBLE)
        |     OR CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |       / len(string_split_regex(trim(text), '\s+')) > CAST(5.0 AS DOUBLE)) AS f_bad_len,
        |    (len(sh) > 0 AND len(sh) > len(list_distinct(sh))) AS f_dup
        |  FROM (SELECT doc_id, text,
        |          [array_to_string(toks[i:i+2], ' ')
        |           for i in generate_series(1, len(toks)-2)] AS sh
        |        FROM (SELECT doc_id, text,
        |                string_split_regex(
        |                  regexp_replace(text, '^\s+|\s+$$', '', 'g'),
        |                  '\s+') AS toks FROM $docRel))),
        |fcnt AS (SELECT CAST(count(*) FILTER (WHERE f_short OR f_low_ttr
        |           OR f_bad_len OR f_dup) AS BIGINT) AS flagged FROM fl),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM members),
        |tpl AS (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS tdocs
        |        FROM (SELECT count(*) AS n FROM $docRel
        |              GROUP BY substr(text, 1, 80) HAVING count(*) >= 2))
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM t
        |  UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM t
        |  UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM t
        |  UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM t
        |  UNION ALL SELECT 'mean_tokens_per_doc',
        |    CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM t
        |  UNION ALL SELECT 'vocab_size', CAST(vocab AS DOUBLE) FROM v
        |  UNION ALL SELECT 'flagged_docs', CAST(flagged AS DOUBLE) FROM fcnt
        |  UNION ALL SELECT 'neardup_member_docs', CAST(nd AS DOUBLE) FROM m
        |  UNION ALL SELECT 'template_docs', CAST(tdocs AS DOUBLE) FROM tpl)
        |ORDER BY metric""".stripMargin

  val queries: Seq[Q] = Seq(

    Q("q32_exact_dedup",
      """SELECT fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM (
        |  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp, doc_id
        |  FROM documents
        |  UNION ALL
        |  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp, doc_id + 1000000
        |  FROM documents)
        |GROUP BY fp ORDER BY keep_doc_id""".stripMargin,
      "Exact dedup on the content fingerprint; the corpus is unioned with a shifted copy of itself so every group provably collapses 2→1.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val doubled = docs.select(col("doc_id"), col("text"))
          .union(docs.select(col("doc_id") + 1000000, col("text")))
        exactDedup(doubled).orderBy(col("keep_doc_id"))
    },

    Q("q85_chunk_dedup",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, concat_ws(' ', s, s, s, s, s, s, s, s, text)
        |  FROM (SELECT doc_id, text, 'u' || CAST(doc_id AS VARCHAR) AS s FROM documents)),
        |docs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM corpus),
        |chunks AS (
        |  SELECT doc_id, arr,
        |    unnest(range(0, CAST(ceil(len(arr) / 8.0) AS BIGINT))) AS chunk_idx
        |  FROM docs),
        |hashed AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(arr[(chunk_idx * 8 + 1):(chunk_idx * 8 + 8)], ' ') AS chunk
        |  FROM chunks),
        |keep AS (
        |  SELECT doc_id, chunk_idx, chunk,
        |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
        |  FROM hashed)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY chunk_idx), '') AS dedup_text
        |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      "Passage-level exact dedup (C4-style, sub-document granularity): documents split into fixed 8-word chunks; a chunk is dropped when its exact text already occurred under an earlier (doc_id, chunk_idx); survivors reassemble into the deduplicated text. The corpus is unioned with salted variants (8 unique salt words + the original text) so each variant provably keeps EXACTLY its salt chunk — the partial-overlap path, not all-or-nothing. Chunks are hashed in place before exploding, so the claim shuffle moves hashes, never text; text flows through one doc_id-keyed join for reassembly.") {
      (s, d) =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val salt = concat(lit("u"), col("doc_id").cast("string"))
        val variants = docs.select((col("doc_id") + 1000000).as("doc_id"),
          concat_ws(" ", (Seq.fill(8)(salt) :+ col("text")): _*).as("text"))
        chunkDedup(docs.union(variants)).orderBy(col("doc_id"))
    },

    Q("q96_source_overlap",
      """WITH ws AS (
        |  SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, unnest(list_distinct(
        |      [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
        |    FROM ws)),
        |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |pairs AS (
        |  SELECT a.source AS s1, b.source AS s2, count(*) AS shared_shingles
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY s1, s2)
        |SELECT p.s1, p.s2, CAST(p.shared_shingles AS BIGINT) AS shared_shingles,
        |  CAST(p.shared_shingles AS DOUBLE) / least(z1.n, z2.n) AS overlap
        |FROM pairs p
        |JOIN sizes z1 ON p.s1 = z1.source
        |JOIN sizes z2 ON p.s2 = z2.source
        |ORDER BY p.s1, p.s2""".stripMargin,
      "Cross-source overlap matrix — the corpus-curation diagnostic for 'which sources leak into each other': per source pair, the count of DISTINCT 3-gram shingles both contain, with the overlap coefficient shared/min(|A|,|B|). High overlap flags mirrored/scraped-twice sources BEFORE pairwise doc dedup is attempted (and tells q94's mixer that two sources are not independent). Same scale shape as q33/q80: a distinct (source, 8-byte ShingleHash64) inverted index joined on the hash — per-shingle join fan-out is bounded by |sources|² and the output by source pairs, never doc x doc; the coefficient is an exact int/int division.") {
      (s, d) =>
        sourceOverlap(Tables.documents(s, d)).orderBy(col("s1"), col("s2"))
    },

    Q("q106_boilerplate_phrases", q106OracleSql,
      "Corpus boilerplate phrase table — the C4/RefinedWeb removal list AS AN ARTIFACT: every word-3-gram that occurs in two or more distinct documents, with its document frequency and df-share, ordered hottest first. This is the list a curator reviews (and the q107 accounting consumes) before cross-document spans are stripped from training text; emitting the PHRASE rather than its hash is the point, so the Spark side uses the compiled ShingleText expression — byte-for-byte the ShingleHash64 tokenize/window loop (one virtual call per row, loop in compiled Scala) emitting text instead of hashes, which keeps this query's notion of a shingle identical to the hash the whole dedup family joins on. Scale shape: per-document distinct shingles dedupe IN-ROW before the explode, so the single shuffle is a map-side-combined count at |shingle vocabulary| keys (bounded by vocab^3, ~27k here; at 100 TB the df>=2 cut drops the unique-phrase long tail before anything is collected, and the blacklist that survives is exactly what ships to q107's broadcast). The corpus doc count joins as a one-row broadcast; df and the >=2 cut are exact integers, df_share one IEEE division.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        docs.select(
            explode(graft.expressions.ShingleText(col("text"), 3)).as("phrase"))
          .groupBy(col("phrase")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2)
          .crossJoin(broadcast(nDocs))
          .select(col("phrase"), col("df"),
            (col("df").cast("double") / col("n_docs").cast("double")).as("df_share"))
          .orderBy(col("df").desc, col("phrase"))
    },

    Q("q107_boilerplate_exposure",
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, unnest(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]) AS sh
        |  FROM toks),
        |bl AS (
        |  SELECT sh FROM (
        |    SELECT sh, count(*) AS df
        |    FROM (SELECT DISTINCT doc_id, sh FROM inst) GROUP BY sh)
        |  WHERE df >= 2),
        |per_doc AS (
        |  SELECT d.doc_id, d.source, count(i.sh) AS n_sh, count(b.sh) AS n_boiler
        |  FROM documents d
        |  LEFT JOIN inst i ON d.doc_id = i.doc_id
        |  LEFT JOIN bl b ON i.sh = b.sh
        |  GROUP BY d.doc_id, d.source)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
        |  CAST(sum(n_boiler) AS BIGINT) AS n_boiler,
        |  CAST(sum(CASE WHEN n_boiler > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_exposed,
        |  CAST(sum(n_boiler) AS DOUBLE) / CAST(sum(n_sh) AS DOUBLE) AS boiler_share,
        |  CAST(sum(CASE WHEN n_boiler > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS exposed_share
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
      "Boilerplate exposure accounting — the FILTER-STAGE impact report for q106's removal list: per source, how many 3-gram occurrences (and how many whole documents) sit on a cross-document repeated phrase, as exact counts plus occurrence- and document-level shares. This is the number a curator checks BEFORE enabling span removal: a source whose boiler_share spikes is mirrored/templated content, and the delta between exposed_share and boiler_share separates 'every doc touches one hot phrase' from 'a few docs are wholly boilerplate'. Scale shape: unlike q106 (which must emit text), the accounting never needs the phrase — both the instance stream and the df>=2 blacklist are 8-byte ShingleHash64 keys (the family-wide 2^-64 collision trade, q96 note), the blacklist is |vocab|-bounded and BROADCAST so the corpus-sized instance stream joins without a shuffle, and the two aggregations ((doc,source) then source) are map-side-combined. explode_outer keeps shingle-less (<3-token) documents in the denominators on the engine side exactly as the oracle's LEFT JOIN does — untripped in the test corpus (min doc length is 10 tokens) but load-bearing for real crawls. Counts are exact integers; the two shares are one IEEE division each.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val inst = docs.select(col("doc_id"), col("source"),
          explode_outer(graft.expressions.ShingleHash64.all(col("text"), 3)).as("h"))
        val bl = boilerplateHashesShared(docs, docKey(d))
          .select(col("h").as("blh"))
        inst.join(broadcast(bl), inst("h") === bl("blh"), "left")
          .groupBy(col("doc_id"), col("source"))
          .agg(count(col("h")).as("n_sh"), count(col("blh")).as("n_boiler"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_sh")).as("n_shingles"),
            sum(col("n_boiler")).as("n_boiler"),
            sum((col("n_boiler") > 0).cast("long")).as("n_docs_exposed"))
          .select(col("source"), col("n_docs"), col("n_shingles"), col("n_boiler"),
            col("n_docs_exposed"),
            (col("n_boiler").cast("double") / col("n_shingles").cast("double"))
              .as("boiler_share"),
            (col("n_docs_exposed").cast("double") / col("n_docs").cast("double"))
              .as("exposed_share"))
          .orderBy(col("source"))
    },

    Q("q110_boilerplate_removal",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |starts AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM toks),
        |grams AS (
        |  SELECT doc_id, i, array_to_string(w[i:i+2], ' ') AS g FROM starts),
        |bl AS (
        |  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g)
        |  WHERE df >= 2),
        |cov AS (
        |  SELECT doc_id, list(i) AS cov FROM grams JOIN bl USING (g) GROUP BY doc_id),
        |fin AS (
        |  SELECT t.doc_id, t.w, coalesce(c.cov, CAST([] AS BIGINT[])) AS cov
        |  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id),
        |k AS (
        |  SELECT doc_id, w,
        |    [w[j] for j in generate_series(1, len(w))
        |     if NOT (list_contains(cov, j) OR list_contains(cov, j - 1)
        |          OR list_contains(cov, j - 2))] AS kept
        |  FROM fin)
        |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens_before,
        |  CAST(len(kept) AS BIGINT) AS n_tokens_after,
        |  -- coalesce: DuckDB's array_to_string of an EMPTY list is NULL,
        |  -- Spark's concat_ws is '' — the fully-boilerplate doc hits this
        |  coalesce(array_to_string(kept, ' '), '') AS cleaned_text
        |FROM k ORDER BY doc_id""".stripMargin,
      "Boilerplate span REMOVAL — the C4-family transform q106/q107 prepare for, actually applied: every token covered by at least one cross-document repeated 3-gram (the SAME `boilerplateHashes` set q107 accounts against — one definition, so the impact report and the transform cannot diverge) is dropped, and each document is reassembled from its surviving tokens with before/after token counts. The membership join runs on 8-byte positional shingle hashes against the broadcast |vocab|-bounded blacklist (never text, never doc x doc); covered START positions collect per document (a bounded int set, <= tokens per doc) and the reconstruction is IN-ROW: a filter-with-index over the token array testing coverage by any of the three starts that could span it — per-row work is O(tokens x covered), zero extra shuffles, and document text crosses exactly one join keyed by doc_id. At 100 TB this is one scan + one broadcast probe + one |docs|-key shuffle — the same budget as q85's chunk dedup. On the synthetic word-salad corpus the cut is brutal by construction (most 3-grams recur at sf0.1 — survivor counts stay >0 at the smaller SFs); real corpora sit far below, which only shrinks cov. The hash-vs-text blacklist is the family 2^-64 collision trade (q96 note) — here a collision would surface as a one-token text diff and a hash-compare failure, so the oracle gate itself polices it.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val bl = boilerplateHashesShared(docs, docKey(d))
          .select(col("h").as("blh"))
        val inst = docs.select(col("doc_id"),
          posexplode(graft.expressions.ShingleHash64.all(col("text"), 3))
            .as(Seq("pos", "h")))
        val cov = inst.join(broadcast(bl), col("h") === col("blh"))
          .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("cov"))
        docs.select(col("doc_id"), wsTokens(col("text")).as("w"))
          .join(cov, Seq("doc_id"), "left")
          .select(col("doc_id"), col("w"),
            coalesce(col("cov"), array().cast("array<int>")).as("cov"))
          .select(col("doc_id"),
            size(col("w")).cast("bigint").as("n_tokens_before"),
            filter(col("w"), (_, i) =>
              !exists(col("cov"), s => s <= i && i <= s + lit(2))).as("kept"))
          .select(col("doc_id"), col("n_tokens_before"),
            size(col("kept")).cast("bigint").as("n_tokens_after"),
            concat_ws(" ", col("kept")).as("cleaned_text"))
          .orderBy(col("doc_id"))
    },

    Q("q97_incremental_neardup",
      SimhashHamCte + """
        |SELECT d1, d2, hamming FROM ham
        |WHERE hamming <= 8
        |  AND (substr(md5(CAST(d1 AS VARCHAR)), 1, 2) >= 'e6'
        |    OR substr(md5(CAST(d2 AS VARCHAR)), 1, 2) >= 'e6')
        |ORDER BY d1, d2""".stripMargin,
      "Incremental near-dup — the daily-ingest path: the md5-split test bucket (q61's function) plays the NEW-arrivals delta, and only its bands probe the corpus band table, so the old x old quadrant of candidate pairs is never recomputed; cost scales with |delta| x bucket density, not |corpus|². Completes the incremental story q65 opened for exact dups. The oracle SPECIFIES the result set (all hamming <= 8 pairs touching a new doc, derived from the full pair set) while the Spark side computes it the incremental way — TextDedupSpec additionally pins the incremental pairs equal to the full q76 pairs filtered to the delta.") {
      (s, d) =>
        incrementalNearDupPairs(Tables.documents(s, d),
            Sampling.hashBucket(col("doc_id")) >= "e6", maxHamming = 8)
          .orderBy(col("d1"), col("d2"))
    },

    Q("q33_ngram_jaccard",
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
        |  FROM ws),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, i * 1.0 / (s1.n + s2.n - i) AS jaccard
        |FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.3
        |ORDER BY d1, d2""".stripMargin,
      "Near-dup pairs by 3-gram Jaccard >= 0.3 via inverted-index join — only co-shingle pairs are ever scored. The registered form carries the document-frequency cut (ngramJaccardPairsCapped, DefaultMaxDocFreq=1000 — inert on testdata where max df is 25, and the guard that keeps one boilerplate shingle from making the index join quadratic at corpus scale).") {
      (s, d) =>
        ngramJaccardPairsCapped(Tables.documents(s, d), 0.3, DefaultMaxDocFreq,
          corpusKey = docKey(d))
          .orderBy(col("d1"), col("d2"))
    },

    Q("q157_containment_pairs",
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
        |  FROM ws),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |          FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, s1.n AS n1, s2.n AS n2,
        |  i * 1.0 / least(s1.n, s2.n) AS containment,
        |  i * 1.0 / (s1.n + s2.n - i) AS jaccard,
        |  i * 1.0 / least(s1.n, s2.n) - i * 1.0 / (s1.n + s2.n - i) >= 0.1
        |    AS partial
        |FROM inter JOIN sizes s1 ON d1 = s1.doc_id
        |  JOIN sizes s2 ON d2 = s2.doc_id
        |WHERE i * 1.0 / least(s1.n, s2.n) >= 0.2
        |ORDER BY d1, d2""".stripMargin,
      "Containment pairs — Broder's ASYMMETRIC resemblance C = |A∩B| / min(|A|,|B|), the measure symmetric Jaccard structurally cannot express: a short document fully quoted inside a much longer one scores C ~ 1 but Jaccard ~ |A|/|B| ~ 0, so a symmetric threshold never fires — yet that superset/quotation/expanded-revision relationship is exactly what licensing review, provenance tracing, and revision-chain dedup need to see. Reported per co-shingle pair over the q33 inverted index (df-cut form, same 8-byte hash keys): both sizes, containment, the symmetric jaccard alongside, and a partial flag (C − J >= 0.1) separating true partial containments from plain near-dups — both flag outcomes exercised at verify scale (the corpus's 4 quote-overlap pairs vs its 25 twin pairs — q33's 0.3-Jaccard gate sees none of those 4). The min-size denominator makes the score exact from the same integer intersection counts; one IEEE division each. Scale: identical plan family to q33 — inverted-index self-join on hashed shingles with the document-frequency cut keeping the hot tail from going quadratic (DedupScaleSpec's bound applies verbatim).") {
      (s, d) =>
        containmentPairs(Tables.documents(s, d), minContain = 0.2,
          corpusKey = docKey(d))
    },

    Q("q34_minhash_lsh",
      """WITH ws AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
        |  FROM ws),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || '|' || sh)) AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed)
        |  GROUP BY doc_id, seed),
        |bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(seed || ':' || mh, ',' ORDER BY seed || ':' || mh) AS sig
        |  FROM mh GROUP BY doc_id, band)
        |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY d1, d2""".stripMargin,
      "MinHash-LSH candidate pairs (k=8 md5-derived minhashes, 4 bands x 2 rows): the scale path — shuffle is |docs|x|bands| fixed-size keys, never all pairs.") {
      (s, d) =>
        minhashCandidates(Tables.documents(s, d), corpusKey = docKey(d))
          .orderBy(col("d1"), col("d2"))
    },

    Q("q65_incremental_dedup",
      """WITH fp AS (
        |  SELECT doc_id, source,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |  FROM documents),
        |existing AS (SELECT * FROM fp WHERE doc_id % 10 < 8),
        |arrivals AS (
        |  SELECT doc_id, source, fp FROM fp WHERE doc_id % 10 >= 8
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, fp FROM fp WHERE doc_id % 10 < 2),
        |seen AS (SELECT DISTINCT fp FROM existing)
        |SELECT a.source, count(*) AS n_arrivals,
        |  CAST(sum(CASE WHEN s.fp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN s.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM arrivals a LEFT JOIN seen s ON a.fp = s.fp
        |GROUP BY a.source ORDER BY a.source""".stripMargin,
      "Incremental-arrival dedup: new documents join against the DISTINCT fingerprints of the existing corpus (16-byte keys — the only state an incremental pipeline carries), so a daily batch never rescans yesterday's text. A replayed slice of the corpus arrives under new ids to prove the drop path fires.") {
      (s, d) =>
        val fp = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), fingerprint(col("text")).as("fp"))
        val existing = fp.filter(col("doc_id") % 10 < 8)
        val arrivals = fp.filter(col("doc_id") % 10 >= 8)
          .unionByName(fp.filter(col("doc_id") % 10 < 2)
            .select((col("doc_id") + 1000000).as("doc_id"), col("source"), col("fp")))
        val seen = existing.select(col("fp")).distinct()
          .withColumn("seen_fp", col("fp"))
        arrivals.join(seen, Seq("fp"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_arrivals"),
            sum(when(col("seen_fp").isNull, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("seen_fp").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
          .orderBy(col("source"))
    },

    Q("q69_dedup_components",
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |  FROM documents)
        |SELECT min(doc_id) AS component, count(*) AS n_members
        |FROM fp GROUP BY fp.fp ORDER BY component""".stripMargin,
      "Pairs-to-groups dedup clustering: connected components (iterative min-label propagation) over the exact-duplicate pair graph of the doubled corpus. The oracle derives the same components INDEPENDENTLY by grouping on the fingerprint itself — two formulations, one answer.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val doubled = docs.select(col("doc_id"), col("text"))
          .union(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        val withFp = doubled.select(col("doc_id"), fingerprint(col("text")).as("fp"))
        val pairs = withFp.as("a").join(withFp.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        connectedComponents(pairs)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy(col("component"))
    },

    Q("q114_dup_cluster_sizes",
      """WITH corpus AS (
        |  SELECT doc_id, text, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, n_chars FROM documents
        |  WHERE doc_id % 10 < 3),
        |fp AS (
        |  SELECT doc_id, n_chars,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |  FROM corpus),
        |cl AS (
        |  SELECT fp, count(*) AS sz,
        |    CAST(sum(n_chars) AS BIGINT) AS chars,
        |    CAST(min_by(n_chars, doc_id) AS BIGINT) AS surv_chars
        |  FROM fp GROUP BY fp),
        |hist AS (
        |  SELECT sz AS cluster_size, count(*) AS n_clusters,
        |    CAST(sum(sz) AS BIGINT) AS n_docs,
        |    CAST(sum(chars) AS BIGINT) AS total_chars,
        |    CAST(sum(chars - surv_chars) AS BIGINT) AS removable_chars
        |  FROM cl GROUP BY sz)
        |SELECT cluster_size, n_clusters, n_docs, total_chars, removable_chars,
        |  CAST(removable_chars AS DOUBLE) /
        |    CAST(sum(total_chars) OVER () AS DOUBLE) AS removable_frac
        |FROM hist ORDER BY cluster_size""".stripMargin,
      "Duplication-factor accounting — the report a curator reads BEFORE deduplicating: histogram of exact-duplicate cluster sizes with the char mass each size holds and the fraction of the corpus that keep-one-per-cluster would remove (the 'how duplicated is this crawl, and what does dedup buy' figure from the dedup literature). Runs on the q69 replicated corpus (two full copies + a 30% third copy) so sizes 2 and 3 both occur; on production data the UNIONs drop away and the same query profiles the raw crawl. The survivor's chars are measured (min_by doc_id — DuckDB's min_by is the same function), not inferred from size, so the accounting stays correct if a fingerprint collision ever grouped unequal docs. Exact integer sums end to end; the single double division happens after aggregation, over a histogram whose row count is the max cluster size. Scale: two map-side-combined shuffles (16-byte fingerprint keys, then tiny size keys) and a one-row window over the bounded histogram — the corpus text itself is hashed in place and never shuffled.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
        val corpus = docs
          .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
            col("text"), col("n_chars")))
          .unionByName(docs.filter(col("doc_id") % 10 < 3)
            .select((col("doc_id") + 2000000).as("doc_id"),
              col("text"), col("n_chars")))
        val cl = corpus
          .select(col("doc_id"), col("n_chars").cast("bigint").as("n_chars"),
            fingerprint(col("text")).as("fp"))
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("sz"), sum(col("n_chars")).as("chars"),
            min_by(col("n_chars"), col("doc_id")).as("surv_chars"))
        val hist = cl.groupBy(col("sz").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
            sum(col("chars")).as("total_chars"),
            sum(col("chars") - col("surv_chars")).as("removable_chars"))
        hist.select(col("cluster_size"), col("n_clusters"), col("n_docs"),
            col("total_chars"), col("removable_chars"),
            (col("removable_chars").cast("double") /
              sum(col("total_chars")).over(Window.partitionBy()).cast("double"))
              .as("removable_frac"))
          .orderBy(col("cluster_size"))
    },

    Q("q117_neardup_threshold_curve",
      SimhashHamCte + """,
        |hist AS (SELECT hamming, count(*) AS n_pairs FROM ham GROUP BY hamming)
        |SELECT hamming, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(sum(n_pairs) OVER (ORDER BY hamming
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_pairs,
        |  CAST(sum(n_pairs) OVER (ORDER BY hamming
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(sum(n_pairs) OVER () AS DOUBLE) AS cum_frac
        |FROM hist ORDER BY hamming""".stripMargin,
      "Near-dup threshold tuning curve: the hamming-distance histogram of SimHash band-sharing candidate pairs, with cumulative counts — the curve a curator reads to PICK the cutoff the q76/q97/q81 family applies (true near-dups pile up at low hamming, the unrelated-pairs mass starts where the curve's second mode rises; the valley between is the threshold). Runs over the same banded candidate generation as q76 — the CAPPED stage (simhashNearDupPairsCapped, DefaultMaxBucket=1000, inert on testdata, hub-star linear under a mega-bucket) with NO hamming cut, so the whole candidate distribution is visible; the known sampling bias is stated rather than hidden — band-sharing pairs are pigeonhole-complete only to hamming ≤ 3 (wider-distance pairs appear only when they happen to share a band), which is exactly the population the production cutoff selects from. Counts are exact integers; the cumulative windows run over a frame bounded by 65 distinct hamming values, and cum_frac is one IEEE division per row.") {
      (s, d) =>
        val hist = nearDupPairsShared(Tables.documents(s, d),
            maxHamming = 64, maxBucket = DefaultMaxBucket,
            corpusKey = docKey(d))
          .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
        val wc = Window.orderBy(col("hamming"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy()
        hist.select(col("hamming"), col("n_pairs"),
            sum(col("n_pairs")).over(wc).as("cum_pairs"),
            (sum(col("n_pairs")).over(wc).cast("double") /
              sum(col("n_pairs")).over(wAll).cast("double")).as("cum_frac"))
          .orderBy(col("hamming"))
    },

    Q("q120_dedup_saturation",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |fp AS (
        |  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
        |  FROM corpus),
        |per_fp AS (
        |  SELECT fp,
        |    CAST(sum(CASE WHEN b < '40' THEN 1 ELSE 0 END) AS BIGINT) AS c25,
        |    CAST(sum(CASE WHEN b < '80' THEN 1 ELSE 0 END) AS BIGINT) AS c50,
        |    CAST(sum(CASE WHEN b < 'c0' THEN 1 ELSE 0 END) AS BIGINT) AS c75,
        |    CAST(count(*) AS BIGINT) AS c100
        |  FROM fp GROUP BY fp),
        |curve AS (
        |  SELECT f.frac,
        |    CAST(sum(CASE f.frac WHEN 0.25 THEN c25 WHEN 0.5 THEN c50
        |                         WHEN 0.75 THEN c75 ELSE c100 END) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN (CASE f.frac WHEN 0.25 THEN c25 WHEN 0.5 THEN c50
        |                         WHEN 0.75 THEN c75 ELSE c100 END) > 0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM per_fp CROSS JOIN (
        |    SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                   CAST(0.75 AS DOUBLE), CAST(1.0 AS DOUBLE)]) AS frac) f
        |  GROUP BY f.frac)
        |SELECT frac, n_docs, n_unique,
        |  CAST(n_docs - n_unique AS DOUBLE) / n_docs AS dup_frac
        |FROM curve ORDER BY frac""".stripMargin,
      "Dedup-rate saturation curve — how duplication GROWS with corpus fraction, measured on nested deterministic subsamples (md5-bucket thresholds at 25/50/75/100%): the extrapolation figure that answers 'is duplication saturating or still compounding as we crawl more' and predicts full-corpus dedup yield from a cheap slice. Pairwise duplication rises superlinearly with the sampled fraction (both copies must land in the sample — at fraction f a 2-cluster is observed duplicated with probability ~f), which the doubled q69 corpus makes visible: dup_frac ≈ f/2 at these points, and a REAL crawl's curve bending above/below that line is the signal. Scale shape: one fingerprint shuffle (16-byte keys) to per-fp membership counts at the four thresholds (conditional sums — the corpus is scanned ONCE for all curve points, the nested-sample property md5 buckets give for free), then a 4-way explode of the |fp| table into one tiny agg; at 100 TB this is exactly the hash-only scan a curator runs BEFORE committing to a full dedup pass. All counts exact integers; dup_frac is one IEEE division per curve point.") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val corpus = docs.select(col("doc_id"), col("text"))
          .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        val perFp = corpus
          .select(fingerprint(col("text")).as("fp"),
            substring(md5(col("doc_id").cast("string")), 1, 2).as("b"))
          .groupBy(col("fp"))
          .agg(sum(when(col("b") < "40", 1L).otherwise(0L)).as("c25"),
            sum(when(col("b") < "80", 1L).otherwise(0L)).as("c50"),
            sum(when(col("b") < "c0", 1L).otherwise(0L)).as("c75"),
            count(lit(1)).as("c100"))
        val curve = perFp
          .select(col("c25"), col("c50"), col("c75"), col("c100"),
            explode(array(lit(0.25d), lit(0.5d), lit(0.75d), lit(1.0d))).as("frac"))
          .select(col("frac"),
            when(col("frac") === 0.25, col("c25"))
              .when(col("frac") === 0.5, col("c50"))
              .when(col("frac") === 0.75, col("c75"))
              .otherwise(col("c100")).as("c"))
          .groupBy(col("frac"))
          .agg(sum(col("c")).as("n_docs"),
            sum(when(col("c") > 0, 1L).otherwise(0L)).as("n_unique"))
        curve.select(col("frac"), col("n_docs"), col("n_unique"),
            ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs"))
              .as("dup_frac"))
          .orderBy(col("frac"))
    },

    Q("q118_arrival_novelty", q118OracleSql,
      "Arrival-batch content novelty: per source, the fraction of an arriving batch's distinct 3-gram shingles never seen in the existing corpus — the freshness gauge of an incremental ingest (a crawler re-fetching mirrors scores near 0 and can be throttled; a source suddenly at 1.0 changed domain or broke). Complements the q65/q97 incremental-dedup pair: those decide keep/drop per DOCUMENT, this one measures what a batch adds per TOKEN-SPAN, the number a 100 TB pipeline tracks per (source, day) to spend crawl budget where novelty lives. Same split convention as q65 (doc_id%10>=8 arrives), same scale shape as q80/q96: the existing corpus compresses to DISTINCT 8-byte ShingleHash64 keys (the persisted state of an incremental pipeline — the corpus text is NEVER rescanned), arrivals probe it with a left join on the hash, and both sides dedupe in-row before the explode so the shuffles move bounded hash sets (the family-wide md5-64 collision trade is documented at q96). Counts exact integers; one IEEE division per source row.") {
      (s, d) =>
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(graft.expressions.ShingleHash64(col("text"))).as("h"))
        val existing = sh.filter(col("doc_id") % 10 < 8)
          .select(col("h")).distinct().withColumn("seen", lit(1))
        val arr = sh.filter(col("doc_id") % 10 >= 8)
          .select(col("source"), col("h")).distinct()
        arr.join(existing, Seq("h"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
          .select(col("source"), col("n_shingles"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_shingles")).as("novelty_frac"))
          .orderBy(col("source"))
    },

    Q("q76_simhash_neardup",
      SimhashHamCte + """
        |SELECT d1, d2, hamming FROM ham WHERE hamming <= 8
        |ORDER BY d1, d2""".stripMargin,
      "SimHash-banded near-dup: per-doc 64-bit signature (codegen'd single pass, md5-derived so the twin re-derives it bit-exactly), candidates from a (band, 16-bit value) equi-join — |docs|*4 constant-size keys, never all pairs — then exact hamming <= 8 re-rank via bit_count(xor). Completes the near-dup family: q33 keys on shingles (grows with text), q34 on MinHash set-similarity bands, this one on a single long per doc. The registered candidate stage is the CAPPED one (simhashNearDupPairsCapped, DefaultMaxBucket=1000 — inert on testdata where no band bucket approaches the cap, hub-star linear under a mega-bucket), so the query a user copies is the one that survives a boilerplate-heavy corpus. The DuckDB twin rebuilds the signature nibble-wise from md5 hex (the q35 machinery), slices the same four bands, and counts differing bits nibble-by-nibble.") {
      (s, d) =>
        nearDupPairsShared(Tables.documents(s, d), maxHamming = 8,
            maxBucket = DefaultMaxBucket, corpusKey = docKey(d))
          .orderBy(col("d1"), col("d2"))
    },

    Q("q80_contamination_check", q80OracleSql,
      "Train/test contamination (decontamination hygiene pass): test-split docs sharing >= 1 three-gram shingle with the train corpus, with shared count and contamination rate. Membership comes from the md5-bucket split function (q61 — no split table), overlap from an equi-join of 8-byte shingle hashes against the DISTINCT train hashes: an inverted-index probe that scales like q33's join, never doc x doc. The rate is an integer/integer division — exact in both engines.") {
      (s, d) =>
        contamination(Tables.documents(s, d), corpusKey = docKey(d))
          .orderBy(col("doc_id"))
    },

    Q("q81_neardup_survivors",
      SimhashBandCte + """,
        |pairs AS (
        |  SELECT c.d1, c.d2 FROM cand c
        |  JOIN nibs n1 ON n1.doc_id = c.d1
        |  JOIN nibs n2 ON n2.doc_id = c.d2 AND n2.p = n1.p
        |  GROUP BY c.d1, c.d2 HAVING sum(bit_count(xor(n1.nv, n2.nv))) <= 8),
        |edges AS (
        |  SELECT d1 AS a, d2 AS b FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (
        |  WITH RECURSIVE r(v, l) AS (
        |    SELECT v, v FROM nodes
        |    UNION
        |    SELECT e.b, r.l FROM r JOIN edges e ON r.v = e.a)
        |  SELECT v, min(l) AS component FROM r GROUP BY v),
        |sized AS (
        |  SELECT r.v AS doc_id, r.component, d.n_chars
        |  FROM reach r JOIN documents d ON r.v = d.doc_id),
        |ranked AS (
        |  SELECT component, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM sized)
        |SELECT r.component, CAST(count(*) AS BIGINT) AS n_members,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS survivor
        |FROM ranked r GROUP BY r.component ORDER BY r.component""".stripMargin,
      "The COMPLETE near-dup dedup pipeline as one query: simhash signatures -> banded candidates -> exact hamming <= 8 pairs -> connected components -> one canonical survivor per cluster (longest n_chars, ties to smallest doc_id). Unlike q69 (whose oracle shortcuts components by grouping on the exact fingerprint), near-dup clusters have no such shortcut, so the DuckDB twin computes TRUE connected components with a recursive CTE (transitive min-label closure) — an independent formulation of the same graph result the iterative Spark join-propagation produces. Survivor selection is a max_by over (n_chars, -doc_id), no per-cluster sort at scale. The candidate stage the registered pipeline ships is the CAPPED one (simhashNearDupPairsCapped, DefaultMaxBucket=1000 — inert on testdata, hub-star linear under a mega-bucket; the star keeps hot buckets connected so components/survivors are preserved).") {
      (s, d) =>
        nearDupSurvivors(Tables.documents(s, d), maxHamming = 8,
          corpusKey = docKey(d))
          .orderBy(col("component"))
    },

    Q("q154_quality_survivors",
      SimhashBandCte + """,
        |pairs AS (
        |  SELECT c.d1, c.d2 FROM cand c
        |  JOIN nibs n1 ON n1.doc_id = c.d1
        |  JOIN nibs n2 ON n2.doc_id = c.d2 AND n2.p = n1.p
        |  GROUP BY c.d1, c.d2 HAVING sum(bit_count(xor(n1.nv, n2.nv))) <= 8),
        |edges AS (
        |  SELECT d1 AS a, d2 AS b FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |nodes AS (SELECT DISTINCT a AS v FROM edges),
        |reach AS (
        |  WITH RECURSIVE r(v, l) AS (
        |    SELECT v, v FROM nodes
        |    UNION
        |    SELECT e.b, r.l FROM r JOIN edges e ON r.v = e.a)
        |  SELECT v, min(l) AS component FROM r GROUP BY v),
        |sized AS (
        |  SELECT r.v AS doc_id, r.component, d.n_chars,
        |    CAST(len(list_distinct(
        |        string_split_regex(trim(lower(d.text)), '\s+'))) AS DOUBLE)
        |      / len(string_split_regex(trim(d.text), '\s+')) AS ttr
        |  FROM reach r JOIN documents d ON r.v = d.doc_id),
        |rl AS (SELECT component, doc_id, row_number() OVER (
        |         PARTITION BY component ORDER BY n_chars DESC, doc_id ASC)
        |         AS rn FROM sized),
        |rq AS (SELECT component, doc_id, row_number() OVER (
        |         PARTITION BY component ORDER BY ttr DESC, doc_id ASC)
        |         AS rn FROM sized),
        |g AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members
        |      FROM sized GROUP BY component),
        |sl AS (SELECT component, doc_id AS survivor_len FROM rl WHERE rn = 1),
        |sq AS (SELECT component, doc_id AS survivor_ttr FROM rq WHERE rn = 1)
        |SELECT g.component, g.n_members, sl.survivor_len, sq.survivor_ttr,
        |  sl.survivor_len <> sq.survivor_ttr AS flipped
        |FROM g JOIN sl USING (component) JOIN sq USING (component)
        |ORDER BY g.component""".stripMargin,
      "Quality-aware canonical election — the curation decision q81 leaves on the table: within each near-dup cluster, which member should SURVIVE? q81's by-length rule (the common default) is compared head-to-head with election by type-token ratio (the q105 gate's lexical-richness signal: among near-identical pages, the member with the least boilerplate padding), reporting both winners per cluster and whether the election FLIPS — the fraction of clusters where keep-the-longest quietly keeps the more templated copy, which is the number that justifies (or kills) a quality-aware canonicalization pass in a pipeline. Same capped banded candidates, hamming re-rank, and true-connected-components as q81 (the oracle's recursive-CTE closure); the TTR is one IEEE division of exact integer token counts per member (the q127 flags definition verbatim), so BOTH elections order deterministically cross-engine (ties to smallest doc_id); survivors are max_by structs, no per-cluster sort. Scale: q81's plan plus one more max_by in the same aggregate — no new shuffle, no new join.") {
      (s, d) =>
        qualitySurvivors(Tables.documents(s, d), maxHamming = 8,
          corpusKey = docKey(d))
    },

    Q("q156_dataset_datasheet", q156OracleSql,
      "The dataset datasheet — the one-page table a data card or release review quotes, assembled as ONE oracle-checked query: corpus size (docs, tokens, langs, sources, mean doc length), vocabulary size, quality-gate exposure (docs tripping ANY q105 flag), near-dup exposure (distinct members of the capped simhash pair set — q76/q81's machinery), and template exposure (docs inside q129's >= 2-doc identical-80-prefix families). Every number is recomputed from its family's SINGLE source of truth (gateFlags verbatim, simhashNearDupPairsCapped, the q129 grouping), so the datasheet can never drift from the queries that explain it — the composition-over-copy principle the q127 lift table established, extended to the whole release summary. Counts are exact integers surfaced as doubles (exactly representable), the one ratio a single IEEE division; vocab counts 8-byte lowered-token hashes on the engine side vs strings in the oracle (the family 2^-64 trade). Scale: each leg is an independent bounded-key aggregate over one corpus scan — they parallelize as sibling stages, nothing joins wider than the capped pair table.") {
      (s, d) =>
        datasetDatasheet(Tables.documents(s, d), corpusKey = docKey(d))
    },

    Q("q129_template_prefixes",
      """SELECT substr(text, 1, 80) AS prefix,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  min(doc_id) AS min_doc_id
        |FROM documents
        |GROUP BY prefix HAVING count(*) >= 2
        |ORDER BY prefix""".stripMargin,
      "Template-prefix detection — the scraped-page pattern the span-level tools miss by construction: documents that OPEN identically (navigation chrome, headers, license preambles — the first 80 code points) grouped into template families, with the distinct-full-text count alongside so head-duplication separates from full duplication (n_distinct_texts = n_docs → shared header on otherwise-different pages, the q106 boilerplate case at document HEAD; n_distinct_texts < n_docs → the group also carries exact dups and belongs to q32). Emitting the PREFIX itself (the q106 artifact principle — a reviewable string, not a hash) is the point. Scale: one map-side-combined groupBy on the 80-char prefix (bounded key, pruned scan reads text/source/doc_id once); the distinct-text count inside each group shuffles md5 fingerprints, never text, and group sizes are template-family-bounded. The >= 2 cut drops the unique-prefix long tail before anything is returned — 19/22/216 groups survive at sf0.001/0.01/0.1, so the path is exercised everywhere. All counts exact integers; total order by prefix.") {
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(substring(col("text"), 1, 80).as("prefix"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            countDistinct(md5(col("text"))).cast("bigint").as("n_distinct_texts"),
            countDistinct(col("source")).cast("bigint").as("n_sources"),
            min(col("doc_id")).as("min_doc_id"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("prefix"))
    },

    Q("q127_quality_dup_lift",
      SimhashBandCte + """,
        |pairs AS (
        |  SELECT c.d1, c.d2 FROM cand c
        |  JOIN nibs n1 ON n1.doc_id = c.d1
        |  JOIN nibs n2 ON n2.doc_id = c.d2 AND n2.p = n1.p
        |  GROUP BY c.d1, c.d2 HAVING sum(bit_count(xor(n1.nv, n2.nv))) <= 8),
        |members AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)),
        |flags AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) < 20 AS f_short,
        |    CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) < CAST(0.32 AS DOUBLE) AS f_low_ttr,
        |    (CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |       / len(string_split_regex(trim(text), '\s+')) < CAST(4.0 AS DOUBLE)
        |     OR CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |       / len(string_split_regex(trim(text), '\s+')) > CAST(5.0 AS DOUBLE)) AS f_bad_len,
        |    (len(sh) > 0 AND len(sh) > len(list_distinct(sh))) AS f_dup
        |  FROM (SELECT doc_id, text,
        |          [array_to_string(toks[i:i+2], ' ')
        |           for i in generate_series(1, len(toks)-2)] AS sh
        |        FROM (SELECT doc_id, text,
        |                string_split_regex(
        |                  regexp_replace(text, '^\s+|\s+$', '', 'g'),
        |                  '\s+') AS toks FROM documents))),
        |j AS (
        |  SELECT f.*, m.doc_id IS NOT NULL AS is_dup
        |  FROM flags f LEFT JOIN members m USING (doc_id)),
        |u AS (
        |  SELECT 'short' AS reason, f_short AS flag, is_dup FROM j
        |  UNION ALL SELECT 'low_ttr', f_low_ttr, is_dup FROM j
        |  UNION ALL SELECT 'bad_len', f_bad_len, is_dup FROM j
        |  UNION ALL SELECT 'dup_3gram', f_dup, is_dup FROM j),
        |a AS (
        |  SELECT reason,
        |    CAST(count(*) FILTER (WHERE flag) AS BIGINT) AS n_flagged,
        |    CAST(count(*) FILTER (WHERE flag AND is_dup) AS BIGINT) AS dup_flagged,
        |    CAST(count(*) FILTER (WHERE NOT flag) AS BIGINT) AS n_clean,
        |    CAST(count(*) FILTER (WHERE NOT flag AND is_dup) AS BIGINT) AS dup_clean
        |  FROM u GROUP BY reason)
        |SELECT reason, n_flagged, dup_flagged, n_clean, dup_clean,
        |  CASE WHEN n_flagged > 0
        |    THEN CAST(dup_flagged AS DOUBLE) / CAST(n_flagged AS DOUBLE) END AS rate_flagged,
        |  CASE WHEN n_clean > 0
        |    THEN CAST(dup_clean AS DOUBLE) / CAST(n_clean AS DOUBLE) END AS rate_clean,
        |  CASE WHEN n_flagged > 0 AND dup_clean > 0
        |    THEN (CAST(dup_flagged AS DOUBLE) / CAST(n_flagged AS DOUBLE))
        |       / (CAST(dup_clean AS DOUBLE) / CAST(n_clean AS DOUBLE)) END AS lift
        |FROM a ORDER BY reason""".stripMargin,
      "Quality × duplication cross-signal monitor — the curation question behind the 'duplicates are disproportionately low-quality' folklore, MEASURED: for each q105 gate reason, the near-dup membership rate (any simhash hamming ≤ 8 pair, the q76 candidate machinery) among flagged docs vs clean docs, with the lift ratio. This is the table that decides pipeline ORDER at 100 TB — if flagged docs carry most of the duplication (lift ≫ 1), running the cheap quality gate BEFORE near-dup dedup shrinks the expensive banded join's input; if lift ≈ 1 the two passes are independent and commute. Flags reuse TextAnalysis.gateFlags (the exact q105 definition — one source of truth) and pair generation reuses the q76 band join; the per-doc membership flag is a left join against the DISTINCT pair-member set (|members| ≤ 2·|pairs|, tiny). Determinism: all counts exact integers; rates and lift are the identical IEEE division shapes on both engines, null-guarded where a denominator can be zero. Scale: the band join is the dominant cost and is q76's machinery running through simhashNearDupPairsCapped — the hot-bucket star cap is ON in the registered query (DefaultMaxBucket=1000, inert on testdata, linear under a mega-bucket); everything after runs on |docs| flag rows + a broadcast-size member set, and the unpivot-aggregate is one |reasons|-key map-side-combined shuffle.") {
      (s, d) =>
        qualityDupLift(Tables.documents(s, d), maxHamming = 8,
          corpusKey = docKey(d))
    },

    Q("q141_crosssource_neardup",
      SimhashHamCte + """,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 8),
        |tagged AS (
        |  SELECT least(a.source, b.source) AS s1,
        |    greatest(a.source, b.source) AS s2, p.d1, p.d2
        |  FROM pairs p
        |  JOIN documents a ON p.d1 = a.doc_id
        |  JOIN documents b ON p.d2 = b.doc_id),
        |np AS (SELECT s1, s2, count(*) AS n_pairs FROM tagged GROUP BY s1, s2),
        |nd AS (SELECT s1, s2, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM (SELECT s1, s2, d1 AS doc_id FROM tagged
        |             UNION ALL SELECT s1, s2, d2 FROM tagged) u
        |       GROUP BY s1, s2)
        |SELECT np.s1, np.s2, np.n_pairs, nd.n_docs,
        |  np.s1 <> np.s2 AS cross_source
        |FROM np JOIN nd ON np.s1 = nd.s1 AND np.s2 = nd.s2
        |ORDER BY np.s1, np.s2""".stripMargin,
      "Cross-source near-duplication matrix — WHERE the duplication lives: per (source, source) pair, the count of simhash hamming <= 8 near-dup pairs whose members span those sources, plus the distinct documents involved. The diagonal (s1 = s2) is within-source duplication (template churn — fix the source's own extraction); off-diagonal mass is MIRRORING (one source republishing another — fix by dropping one side wholesale, far cheaper than pairwise dedup). This is the q96 shingle-overlap matrix upgraded from token-set overlap to verified near-dup pairs, and the table a curator reads to decide crawl-source precedence before spending the full q81 components pass. Pair generation is the registered capped q76 machinery (simhashNearDupPairsCapped, DefaultMaxBucket inert at test scale); the source tags arrive by two |docs|-key joins of an 8-byte pair table against (doc_id, source), the matrix aggregate is |sources|^2-key map-side-combined, and the distinct-doc count works on the same bounded pair set. least/greatest normalization makes the matrix upper-triangular so A->B and B->A mirroring land in one cell on both engines; all counts exact integers, full value-hash oracle against the uncapped pair semantics.") {
      (s, d) =>
        crossSourceNearDup(Tables.documents(s, d), maxHamming = 8,
          corpusKey = docKey(d))
    },

    Q("q143_minhash_calibration",
      s"""WITH ws AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
        |  FROM ws),
        |mh AS (
        |  SELECT doc_id, seed, min(md5(seed || '|' || sh)) AS mh
        |  FROM sh CROSS JOIN (SELECT unnest(range(8)) AS seed)
        |  GROUP BY doc_id, seed),
        |bands AS (
        |  SELECT doc_id, seed // 2 AS band,
        |    string_agg(seed || ':' || mh, ',' ORDER BY seed || ':' || mh) AS sig
        |  FROM mh GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        |agree AS (
        |  SELECT c.d1, c.d2,
        |    CAST(count(*) FILTER (WHERE x.mh = y.mh) AS INT) AS n_agree
        |  FROM cand c
        |  JOIN mh x ON x.doc_id = c.d1
        |  JOIN mh y ON y.doc_id = c.d2 AND y.seed = x.seed
        |  GROUP BY c.d1, c.d2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.d1, c.d2, count(*) AS ni
        |  FROM cand c
        |  JOIN sh s1 ON s1.doc_id = c.d1
        |  JOIN sh s2 ON s2.doc_id = c.d2 AND s2.sh = s1.sh
        |  GROUP BY c.d1, c.d2),
        |j AS (
        |  SELECT a.n_agree, CAST(a.n_agree AS DOUBLE) / 8 AS est_jaccard,
        |    CAST(COALESCE(i.ni, 0) AS DOUBLE)
        |      / CAST(z1.n + z2.n - COALESCE(i.ni, 0) AS DOUBLE) AS tj
        |  FROM agree a
        |  LEFT JOIN inter i ON i.d1 = a.d1 AND i.d2 = a.d2
        |  JOIN sizes z1 ON z1.doc_id = a.d1
        |  JOIN sizes z2 ON z2.doc_id = a.d2)
        |SELECT n_agree, est_jaccard, count(*) AS n_pairs,
        |  ${graft.functions.DetAgg.sql.davg("tj")} AS avg_true_jaccard,
        |  ${graft.functions.DetAgg.sql.davg("abs(est_jaccard - tj)")} AS avg_abs_err
        |FROM j GROUP BY n_agree, est_jaccard ORDER BY n_agree""".stripMargin,
      "MinHash estimator calibration — what an 'agreeing' signature actually MEANS: for the banded candidate pairs (the population the dedup pipeline acts on), the k=8 signature-agreement fraction vs the TRUE distinct-3-gram Jaccard, bucketed by agreement count with pair counts, mean true Jaccard, and mean |estimate − truth|. This is the table that turns the LSH threshold from folklore into a measured operating point (estimator stderr ≈ 1/√k ≈ 0.35 at k=8 — the measured per-bucket error shows exactly how much, and raising k is the production fix this query prices). Candidate generation is the CAPPED band join (registered 100 TB semantics, inert on testdata); signatures are the compiled per-row MinHashSig (md5-derived, so the twin re-derives them string-identically and even the agreement counts are engine-exact); the true-Jaccard leg is the q33 inverted-probe restricted to candidates — |pairs|·S̄ 8-byte rows, never all pairs (hash-vs-string counting is the family's 2^-64 collision trade, policed by this oracle). Integer agreement buckets, exact integer Jaccard ratios, DetAgg decimal averages: full value-hash oracle.") {
      (s, d) =>
        minhashCalibration(Tables.documents(s, d), corpusKey = docKey(d))
    },

    Q("q144_clean_holdout",
      """WITH sp AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |ws AS (SELECT doc_id, split, string_split_regex(trim(text), '\s+') AS w FROM sp),
        |sh AS (
        |  SELECT doc_id, split, unnest(list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])) AS sh
        |  FROM ws),
        |train_sh AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
        |bad AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM sh t JOIN train_sh tr ON t.sh = tr.sh
        |  WHERE t.split = 'test')
        |SELECT s.source, count(*) AS n_test,
        |  CAST(count(b.doc_id) AS BIGINT) AS n_contaminated,
        |  count(*) - count(b.doc_id) AS n_clean,
        |  CAST(count(*) - count(b.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS clean_frac
        |FROM sp s LEFT JOIN bad b ON s.doc_id = b.doc_id
        |WHERE s.split = 'test'
        |GROUP BY s.source ORDER BY s.source""".stripMargin,
      "Decontaminated holdout constructor — the step AFTER q80's contamination report: per source, how much of the md5-bucket test split SURVIVES decontamination (zero 3-gram-shingle overlap with the train split) and is actually usable for evaluation. The clean count is the denominator every eval metric on this corpus should quote, and a source whose clean_frac collapses cannot be evaluated at all (its test docs are all seen in training — the practical outcome of mirrored sources that q141 localizes). Composes q61's engine-portable split function with q80's inverted-index overlap probe (8-byte shingle hashes vs the DISTINCT train set — never doc×doc; string-vs-hash counting is the family's 2^-64 trade); docs too short for a complete shingle are trivially clean on both engines. One |sources|-key aggregate closes it: exact integer counts, one IEEE division, full value-hash oracle.") {
      (s, d) =>
        cleanHoldout(Tables.documents(s, d), corpusKey = docKey(d))
    },

    Q("q153_tombstone_cascade",
      """WITH base AS (SELECT doc_id, text FROM documents
        |              UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |t AS (SELECT doc_id, text,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS tomb
        |      FROM base),
        |fp AS (SELECT doc_id, tomb,
        |         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
        |           AS fp
        |       FROM t),
        |g AS (SELECT fp, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN tomb THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |        min(doc_id) AS mn,
        |        min(CASE WHEN tomb THEN doc_id END) AS mnt
        |      FROM fp GROUP BY fp),
        |ga AS (SELECT
        |        CAST(sum(CASE WHEN nt = n THEN 1 ELSE 0 END) AS BIGINT)
        |          AS erased,
        |        CAST(sum(CASE WHEN nt > 0 AND nt < n AND mn = mnt
        |          THEN 1 ELSE 0 END) AS BIGINT) AS recanon,
        |        CAST(count(*) AS BIGINT) AS groups FROM g),
        |tok AS (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |        FROM t),
        |off AS (SELECT doc_id, n_tok,
        |          CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) AS o
        |        FROM tok),
        |pw AS (SELECT doc_id, CAST(o // 512 AS BIGINT) AS s,
        |         CAST((o + n_tok - 1) // 512 AS BIGINT) AS e
        |       FROM off),
        |tw AS (SELECT CAST(max(e) + 1 AS BIGINT) AS total FROM pw),
        |aw AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS affected
        |       FROM (SELECT unnest(generate_series(s, e)) AS w
        |             FROM pw JOIN t USING (doc_id) WHERE t.tomb)),
        |ed AS (SELECT CAST(count(*) AS BIGINT) AS affected FROM embeddings e
        |       JOIN t ON e.vec_id = t.doc_id WHERE t.tomb),
        |et AS (SELECT CAST(count(*) AS BIGINT) AS total FROM embeddings),
        |dd AS (SELECT
        |        CAST(sum(CASE WHEN tomb THEN 1 ELSE 0 END) AS BIGINT)
        |          AS affected,
        |        CAST(count(*) AS BIGINT) AS total FROM t)
        |SELECT artifact, affected, total,
        |  CAST(affected AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM (
        |  SELECT 'documents' AS artifact, affected, total FROM dd
        |  UNION ALL SELECT 'dup_groups_erased', erased, groups FROM ga
        |  UNION ALL SELECT 'dup_groups_recanonicalized', recanon, groups
        |    FROM ga
        |  UNION ALL SELECT 'packed_windows', aw.affected, tw.total
        |    FROM aw CROSS JOIN tw
        |  UNION ALL SELECT 'embeddings', ed.affected, et.total
        |    FROM ed CROSS JOIN et)
        |ORDER BY artifact""".stripMargin,
      "Tombstone-cascade audit — the right-to-be-forgotten impact table a compliance review demands BEFORE executing a deletion: given a deterministic tombstone set (md5 bucket of doc_id, ~1/8 of the corpus — wide enough that the erased-group outcome is exercised, not vestigial, at test scale — in production, the actual deletion requests), how far the deletion propagates through every derived artifact. Reported per artifact: raw documents to drop; exact-dup groups ERASED outright (every member tombstoned — their fingerprint leaves the dedup state) vs groups needing RE-CANONICALIZATION (the kept min-doc_id representative is tombstoned but survivors exist — q32's keep rule must re-elect, and anything keyed on the old canonical goes stale); 512-token packed training windows overlapping any tombstoned doc (q145's ledger rows to invalidate — fragmentation means one deletion can poison two windows); and embedding rows (1:1 on vec_id). The audit universe is the q32 id-shifted doubled corpus, which makes all three group outcomes provably exercised at test scale (twin survives -> re-canonicalize; both twins drawn -> erased; neither -> untouched). All legs are exact integer counts over existing machinery (q32 fingerprints, q145 offsets); shares are one IEEE division each. Scale: the group leg is one fingerprint-key agg, the window leg one prefix-sum + a distinct over the TOMBSTONED docs' window ids only (|tombstones| x spans, never the corpus), embeddings a semi-join on 8-byte ids.") {
      (s, d) =>
        tombstoneCascade(Tables.documents(s, d), Tables.embeddings(s, d))
    },

    Q("q161_dedup_savings_curve",
      SimhashHamCte + """,
        |memh AS (
        |  SELECT doc_id, min(hamming) AS hmin FROM (
        |    SELECT d1 AS doc_id, hamming FROM ham WHERE hamming <= 8
        |    UNION ALL SELECT d2 AS doc_id, hamming FROM ham WHERE hamming <= 8)
        |  GROUP BY doc_id),
        |dtok AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt FROM documents),
        |toth AS (SELECT CAST(count(*) AS BIGINT) AS total_docs,
        |    CAST(sum(nt) AS BIGINT) AS total_tokens FROM dtok),
        |perh AS (SELECT hmin, count(*) AS nd, CAST(sum(nt) AS BIGINT) AS toks
        |  FROM memh JOIN dtok USING (doc_id) GROUP BY hmin),
        |lvh AS (SELECT unnest(range(9)) AS h)
        |SELECT CAST(lvh.h AS INTEGER) AS max_hamming,
        |  COALESCE(CAST(sum(nd) AS BIGINT), 0) AS docs_exposed,
        |  COALESCE(CAST(sum(toks) AS BIGINT), 0) AS tokens_exposed,
        |  CAST(COALESCE(sum(nd), 0) AS DOUBLE) / CAST(total_docs AS DOUBLE)
        |    AS frac_docs,
        |  CAST(COALESCE(sum(toks), 0) AS DOUBLE) / CAST(total_tokens AS DOUBLE)
        |    AS frac_tokens
        |FROM lvh LEFT JOIN perh ON perh.hmin <= lvh.h CROSS JOIN toth
        |GROUP BY lvh.h, total_docs, total_tokens
        |ORDER BY max_hamming""".stripMargin,
      "Dedup SAVINGS curve — the cost/benefit table a curator reads to PRICE a near-dup pass before running it: for every hamming cutoff h in [0, 8], how many documents and how much token mass sit inside the pair graph at that threshold (exposure — the upper bound on what a survivor election could remove). Complements q117 (pair counts per hamming: where the knee is) by converting each cutoff into CORPUS MASS, which is what storage and training-token budgets are denominated in. One pass: each doc's MINIMUM pair hamming decides the first threshold exposing it, so the cumulative curve falls out of a single min-aggregate over the registered capped pair table (simhashNearDupPairsCapped, DefaultMaxBucket inert at test scale) — never one components run per threshold. Counts exact integers; the two fractions are one IEEE division each against one-row corpus totals; the 9-level frame joins a <= 9-row hmin histogram, so the curve costs nothing beyond the band join every sibling query already pays.") {
      (s, d) =>
        dedupSavingsCurve(Tables.documents(s, d), maxHamming = 8,
          corpusKey = docKey(d))
    },

    Q("q162_split_leakage",
      SimhashHamCte + """,
        |pairs AS (SELECT d1, d2 FROM ham WHERE hamming <= 8),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |tagged AS (
        |  SELECT least(a.split, b.split) AS s1, greatest(a.split, b.split) AS s2,
        |    p.d1, p.d2
        |  FROM pairs p
        |  JOIN sp a ON p.d1 = a.doc_id
        |  JOIN sp b ON p.d2 = b.doc_id),
        |np AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM tagged GROUP BY s1, s2),
        |nd AS (SELECT s1, s2, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM (SELECT s1, s2, d1 AS doc_id FROM tagged
        |             UNION ALL SELECT s1, s2, d2 FROM tagged) u
        |       GROUP BY s1, s2)
        |SELECT np.s1, np.s2, np.n_pairs, nd.n_docs,
        |  np.s1 <> np.s2 AS cross_split
        |FROM np JOIN nd ON np.s1 = nd.s1 AND np.s2 = nd.s2
        |ORDER BY np.s1, np.s2""".stripMargin,
      "Eval-leakage matrix — near-dup pairs (simhash hamming <= 8, the registered capped q76 stage) tallied per train/val/test split cell: the near-dup COMPLEMENT of q80's exact shingle-containment decontamination. A test document that is a near-duplicate of a train document inflates every benchmark it appears in even when no shingle matches verbatim — the leakage class verbatim decontamination provably misses, and the reason eval suites deduplicate against pretraining corpora with fuzzy matching. The q141 matrix shape applied to the split dimension: least/greatest cell normalization so train-test and test-train land in one upper-triangular cell on both engines, distinct-doc counts per cell from the same bounded pair set, and the off-diagonal train/test row is the number a decontamination pass must drive to zero. Splits are the family's stateless md5-bucket membership (no split table exists to join); counts exact integers; the pair-tagging joins are two |docs|-key probes of an 8-byte pair table.") {
      (s, d) =>
        splitLeakageMatrix(Tables.documents(s, d), maxHamming = 8,
          corpusKey = docKey(d))
    },

    Q("q166_minhash_band_planner", q166OracleSql(k = 8),
      "MinHash banding PLANNER — the (bands x rows-per-band) operating-point table behind every LSH dedup deployment: for each factorization of the k=8 signature, the closed-form S-curve capture probability 1-(1-s^r)^b at reference similarities 0.3/0.5/0.7 NEXT TO the measured candidate-pair count on this corpus. Theory picks the threshold shape (r=1 catches nearly everything incl. junk; r=8 demands all-8 agreement), the measured column prices it in verification work — the pair of numbers q34 (which ships b=4, r=2) and q143 (which calibrates what agreement MEANS) both presuppose. Determinism: the S-curve values are computed once on the driver and embedded as identical literals in BOTH plans — no cross-engine pow() parity bet; candidate counts ride the q143-pinned equivalence of the engine's positional band signatures and the oracle's seed-tagged string_agg bands. Scale: ONE compiled-MinHashSig pass (checkpointed) feeds all four band derivations; each count is the CAPPED band self-join (registered-cap principle, inert at test scale) collapsed to one row — four bounded joins over a 16-byte/doc table, never a corpus rescan per configuration.") {
      (s, d) =>
        minhashBandPlanner(Tables.documents(s, d), k = 8,
          corpusKey = docKey(d))
    },

    Q("q168_formatting_variants",
      """WITH c AS (
        |  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
        |    md5(text) AS raw
        |  FROM documents
        |  UNION ALL
        |  SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))),
        |    md5(text)
        |  FROM documents
        |  UNION ALL
        |  SELECT md5(trim(regexp_replace(lower(text || ' .'), '[^a-z0-9]+', ' ', 'g'))),
        |    md5(text || ' .')
        |  FROM documents),
        |g AS (
        |  SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT raw) AS BIGINT) AS n_raw_variants
        |  FROM c GROUP BY fp)
        |SELECT n_docs, n_raw_variants, CAST(count(*) AS BIGINT) AS n_groups,
        |  n_raw_variants > 1 AS has_formatting_variants
        |FROM g WHERE n_docs >= 2
        |GROUP BY n_docs, n_raw_variants
        |ORDER BY n_docs, n_raw_variants""".stripMargin,
      "Formatting-variant audit — splits the exact-dup mass q32 collapses into its two REAL populations: byte-identical copies (same raw md5 — storage/crawl bugs, dedupe at the blob layer, q133's machinery) vs FORMATTING VARIANTS (same content after the q32 normalization, different raw bytes — extraction artifacts that reappear with every crawl until the normalizer is fixed). The distinction decides which team gets the ticket, which is why data-quality audits report it separately. The operator fingerprints whatever corpus it is given (on a dup-free corpus the histogram is honestly empty); the registration feeds it the q32-convention fixture corpus (original + byte-identical twin + a punctuation-perturbed copy whose ' .' suffix the normalizer provably erases — built in the registration body, the sibling-fixture convention of q32/q85/q170/q173), so BOTH outcomes are exercised at test scale: every group carries >= 3 members with exactly 2 raw variants, plus whatever natural dup structure the corpus adds. Output is the (group size, raw-variant count) histogram over groups with >= 2 members — bounded by the distinct size pairs, never per-group rows. Determinism: both fingerprints are md5 over identically-normalized strings (the q32 parity already proven cross-engine); counts exact. Scale: one fingerprint-key map-side-combined aggregate (the q32 plan) with one extra countDistinct riding the same shuffle, then a tiny histogram aggregate.") {
      (s, d) => {
        val base = Tables.documents(s, d).select(col("text"))
        val fixture = base
          .unionAll(base) // byte-identical twin
          .unionAll(base.select(concat(col("text"), lit(" .")).as("text")))
        formattingVariants(fixture)
      }
    },

    Q("q181_datasheet_state_served", q156OracleSql,
      "q156's release datasheet served FROM the MAINTAINED corpus state instead of a full-corpus batch pass — the dedup family's half of the q180 posture: the state dir is built once per (session, corpus) by folding the corpus through DatasheetStateStream.update in two arrival waves (the SAME micro-batch fold the maintenance stream runs — additive counters and the ledger-protocol delta tables (incl. the df-counted lang/source/word key tables) — folded to per-key snapshots before serving, so the hash gate also re-proves fold neutrality cross-engine — and CorpusStateStream's signature table), and every timed run then pays ONLY the serving read: counters-sum + set-table counts + the capped band join over 16 bytes/doc of PERSISTED signatures (simhashNearDupPairsCappedFromSigs — the q76/q81 definition over state instead of a fresh scan) + a prefix-table aggregate. The oracle twin is q156's SQL verbatim, so a hash match here proves end-to-end that the datasheet a data card quotes from maintained state and the one a batch recompute would produce are value-identical — the DatasheetStreamSpec state==batch contract re-checked by the driver's own harness. Scale: this is THE way a 100 TB corpus quotes its datasheet — the corpus text is scanned once at arrival (amortized into ingest), and the read side touches only state tables bounded by |vocab|, |langs|, |sources|, |prefixes>=2|, and 16 bytes/doc of signatures; no read-time rescan exists in the plan.") {
      (s, d) =>
        graft.streaming.DatasheetStateStream.datasheetFromState(s,
          servedDatasheetStateDir(s, d))
    },

    Q("q212_forgotten_datasheet_state_served",
      q156OracleSqlOver(
        "(SELECT * FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '" +
          graft.operators.Sampling.TombstoneHex + "')"),
      "q181's maintained datasheet served AFTER a right-to-be-forgotten pass — the family's last documented-immutable surface EXECUTED instead of only named: r14's datasheet kept langs/sources/words as distinct-key SETS, where membership cannot be un-asserted without knowing whether a surviving document still holds the key; this round upgrades them to df-counted delta tables (+8 B/key, the trade q204's shingle decontamination layout already made), after which deletion is the proven negative-ledger mechanic everywhere: DatasheetStateStream.forget appends the tombstoned documents' counter/prefix/lang/source/word contributions as ONE negative ledger-committed batch (a key whose net reaches 0 leaves the sheet through the > 0 cut — a language whose every document died disappears from n_langs, a word from vocab_size) and swaps the signature table to the doc_id survivors, so the near-dup metric re-serves over exactly the surviving corpus. The oracle is q156's SQL over the tombstone-survivor documents; the builder REPLAYS the forget with the same batchId (ledger no-op) and then FOLDS all five delta logs, so one hash match proves deletion correctness, deletion idempotence, and fold neutrality across a negative batch, cross-engine. Scale: the forget is one |tombstoned|-bounded projection per table + an 8-byte-key anti-join over sigs — never a corpus rescan; the read keeps q181's cost.") {
      (s, d) =>
        graft.streaming.DatasheetStateStream.datasheetFromState(s,
          servedForgottenDatasheetDir(s, d))
    },

    Q("q188_novelty_state_served", q118OracleSql,
      "q118's arrival-novelty probe served FROM the MAINTAINED shingle state instead of a same-query split — the corpus-state family's last unserved read, closing the q180–q187 pattern: every maintained state table in the tree now faces the driver's hash gate through a registered serving query. The state dir is built once per (session, corpus) by folding q118's `existing` corpus (the doc_id%10<8 split) through the df-counted layout's micro-batch update (CorpusStateStream.updateShingleDf, two parity waves plus a replayed wave — the ledger-protocol idempotence paths), then snapshot-folding, and every timed run then pays ONLY the serving read (CorpusStateStream.noveltyAgainstDfState, the ingest-gate 'how fresh is this batch' probe run BEFORE admitting it): |arrivals| compiled shingle derivation + ONE left join of the batch's bounded distinct hash set against 8-byte persisted keys with pushdown — the existing corpus TEXT is never rescanned, which is the entire point of maintaining the state. Serving from the df layout (membership = net df > 0, value-identical to the r15 set table under accumulation — the oracle twin doesn't change) is what makes the DEPLOYED novelty gate deletion-capable: q214 proves the forgotten form under the same gate, so the runbook's 'every served metric can forget' claim now holds with no set-table exception. The oracle twin is q118's SQL verbatim, so a hash match proves end-to-end that novelty measured against incrementally-maintained state and against a full-corpus recompute are value-identical — the CorpusStateStreamSpec state==batch contract re-checked by the driver's own harness every round. Scale: at 100 TB the persisted set is the only artifact the probe touches (bounded by |distinct shingles|, bucketable on the hash), and per-batch cost is independent of corpus age.") {
      (s, d) =>
        graft.streaming.CorpusStateStream.noveltyAgainstDfState(
            servedNoveltyStateDir(s, d),
            Tables.documents(s, d)
              .filter(col("doc_id") % 10 >= 8)
              .select(col("source"), col("text")))
          .orderBy(col("source"))
    },

    Q("q190_contamination_state_served", q80OracleSql,
      "q80's train/test contamination report served FROM the MAINTAINED train-shingle state — the decontamination read the way an eval pipeline actually runs it: the training corpus's shingle state is maintained once at ingest (here folded through the df-counted layout — CorpusStateStream.updateShingleDf over exactly q80's md5-bucket train split, two parity waves plus a replayed wave, then snapshot-folded; membership = net df > 0, value-identical to the r15 set table, so the SERVED decontamination read is deletion-capable as deployed and q204 proves its forgotten form), and every benchmark candidate set is probed against that state — per test doc, shared-shingle count and contamination fraction, contaminated docs only. The read is CorpusStateStream.contaminationAgainstDfState (the per-doc dual of q188's per-source novelty): |probe| compiled shingle derivation + ONE pushdown semi-join against 8-byte persisted keys — the training corpus text is NEVER rescanned per eval suite, which is what makes decontamination-before-every-release affordable at 100 TB. The oracle twin is q80's SQL verbatim, so the hash gate proves contamination measured against incrementally-maintained state and a full-corpus split recompute are value-identical. Scale: state bounded by |distinct train shingles|; per-probe cost is the eval set's size, independent of corpus age.") {
      (s, d) =>
        graft.streaming.CorpusStateStream.contaminationAgainstDfState(
            servedTrainShingleStateDir(s, d),
            Tables.documents(s, d)
              .select(col("doc_id"), col("text"))
              .filter(Sampling.splitOf(col("doc_id")) === "test"))
          .orderBy(col("doc_id"))
    },

    Q("q191_boilerplate_state_served", q106OracleSql,
      "q106's C4-style boilerplate blacklist served FROM MAINTAINED state — the artifact's production shape: document frequency per cross-document word-3-gram accumulates as additive (batch_id, phrase, delta) rows under the vocab delta-ledger protocol (deltas append before the ledger row, so a crash-replay can never double a count) as batches arrive, and the reviewed removal list — df >= 2 with its df_share against the accumulated corpus size, hottest first — is a |phrase-vocabulary|-key sum over the persisted counts; the corpus text is scanned ONCE at arrival, never per blacklist refresh, which is what lets a 100 TB curation stack re-quote its removal list per crawl. The state dir is built once per (session, corpus) in two parity waves plus a replayed wave (BoilerplateStateStream.update), then FOLDED to per-phrase snapshots (CorpusStateStream.foldDeltaState, the fifth delta table in the tree) before serving — so the oracle twin, q106's SQL verbatim, makes the driver's hash gate re-prove BOTH incremental-df == batch-df AND fold neutrality cross-engine every round. The phrase TEXT is the state key deliberately: the blacklist is a human-reviewed artifact (hashing the key would defeat review and admit collisions the batch groupBy does not have). Scale: per batch one compiled ShingleText pass into a map-side-combined aggregate; read side bounded by the 3-gram vocabulary with the df cut applied before any ordering.") {
      (s, d) =>
        graft.streaming.BoilerplateStateStream.phraseTableFromState(s,
          servedBoilerplateStateDir(s, d))
    },

    Q("q204_forgotten_contamination_state_served", q204OracleSql,
      "q190's decontamination read AFTER a right-to-be-forgotten pass over the training corpus — the leg that closes the deletion family's one documented gap by PAYING for it: a set-table layout cannot execute a forget (membership cannot un-assert without knowing whether a surviving document still holds the shingle), so q190 and this read both run against the df-COUNTED variant (CorpusStateStream.updateShingleDf — per-shingle document frequency as additive ledger deltas, the +8 B/key trade the runbook's deletion table names), where forgetting train docs is the same negative-delta batch as q200/q201, the fold nets it, and membership is net df > 0 — shingles whose every holder was forgotten leave the set, so an eval doc sharing text ONLY with deleted training data correctly reports clean. The oracle is q80's SQL with the tombstone-survivor conjunct on the train side only (every tombstoned doc IS train: first md5 hex 'a' < the 'cc' split boundary — the probe side stays the full test split). A replayed forget re-proves deletion idempotence under the gate. Scale: the probe plan is q190's (one scan, one pushdown join); deletion cost is one shingle pass over the FORGOTTEN docs; state is |distinct train shingles| × 24 B unfolded, snapshot-bounded after folds.") {
      (s, d) =>
        graft.streaming.CorpusStateStream.contaminationAgainstDfState(
            servedForgottenTrainShingleDir(s, d),
            Tables.documents(s, d)
              .select(col("doc_id"), col("text"))
              .filter(Sampling.splitOf(col("doc_id")) === "test"))
          .orderBy(col("doc_id"))
    },

    Q("q200_forgotten_blacklist_state_served", q200OracleSql,
      "q191's maintained boilerplate blacklist AFTER a right-to-be-forgotten pass — the corpus-state twin of q199, and the payoff of keeping curation state as ADDITIVE DELTAS instead of materialized counts: q153 audits a deletion's blast radius, BoilerplateStateStream.forget EXECUTES it by appending the tombstoned documents' phrase-df and doc-count contributions with a minus sign as one more ledger-committed batch (the request's own documents re-read by id pushdown — |forgotten| rows, never a corpus rescan), the same fold then NETS deletion against accumulation, and the served removal list — df >= 2 over net counts, n_docs denominator shrunk — must hash-equal q106's batch chain over exactly the surviving documents (the oracle is q106's SQL with the tombstone-survivor predicate on the document relation; the q153 md5-bucket rule at ~1/16, identical bytes in both engines). A replayed forget in the builder makes the gate re-prove deletion idempotence; phrases whose net df reaches 0 stay as zero rows in the snapshot (the key-domain residue trade, documented) and can never serve past the df cut. Scale: deletion cost is one ShingleText pass over the FORGOTTEN docs plus two bounded appends; the read stays |phrase-vocabulary|-keyed.") {
      (s, d) =>
        graft.streaming.BoilerplateStateStream.phraseTableFromState(s,
          servedForgottenBpStateDir(s, d))
    },

    Q("q214_forgotten_novelty_state_served", q214OracleSql,
      "q188's ingest-gate novelty probe AFTER a right-to-be-forgotten pass over the existing corpus — the read that completes the df-shingle family (q188 serves accumulation, q204 the decontamination dual, this the forgotten novelty): CorpusStateStream.forgetShingleDf nets the tombstoned existing documents' per-shingle df contributions out as one negative ledger batch, the fold merges the mixed-sign log, and membership reverts to net df > 0 — so a shingle ALL of whose holders were deleted counts as novel again, which is the operationally correct answer (re-admitting that text re-pays its storage: the corpus genuinely no longer contains it; an index that kept serving 'seen' for deleted text would silently starve re-ingestion forever). The oracle is q118's SQL with the tombstone-survivor conjunct on the EXISTING side only (the arrival side stays the full %10>=8 split — deletion requests target the corpus, not the probe), so the hash gate proves novelty measured against forgotten state equals a full recompute over exactly the surviving corpus. A replayed forget in the builder re-proves deletion idempotence under the gate. Scale: the probe plan is q188's (one arrival scan, one pushdown join); deletion cost is one shingle pass over the FORGOTTEN docs; state stays |distinct shingle| x 24 B, snapshot-bounded after folds.") {
      (s, d) =>
        graft.streaming.CorpusStateStream.noveltyAgainstDfState(
            servedForgottenNoveltyDir(s, d),
            Tables.documents(s, d)
              .filter(col("doc_id") % 10 >= 8)
              .select(col("source"), col("text")))
          .orderBy(col("source"))
    },
  )

  /** Build-once on-disk datasheet/corpus state for the state-served read
    * (q181): fold the corpus through the SAME micro-batch update the
    * maintenance stream runs — in two doc_id-parity waves, so the
    * anti-join/ledger idempotence paths execute, not just the empty-state
    * fast path — into a fresh temp stateDir, memoized per (session,
    * corpus) so timed bench reps pay only the READ. protectNew = false:
    * the durable product is the on-disk state; the fold's transient
    * checkpoint blocks are pure leak and are unpersisted (the q180
    * servedIvfStateDir contract). */
  private def servedDatasheetStateDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"dsstate|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_ds_state").toString)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      graft.streaming.DatasheetStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.DatasheetStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 =!= 0), 1L)
      // serve from FOLDED state: the delta logs collapse to per-key
      // snapshots, so the driver's q181 hash gate re-proves fold
      // neutrality cross-engine every round (not just in the spec)
      graft.streaming.DatasheetStateStream.foldDeltas(s, dir)
      dir
    }

  /** Build-once FORGOTTEN datasheet state for q212: the
    * servedDatasheetStateDir protocol (two parity waves), then
    * DatasheetStateStream.forget with the shared tombstone rule — the
    * negative ledger batch across all five delta tables plus the keyed
    * sigs swap — REPLAYED with the same batchId (ledger no-op), then
    * folded, so the q212 hash gate re-proves deletion idempotence AND
    * fold neutrality across a negative batch cross-engine. */
  private[operators] def servedForgottenDatasheetDir(s: SparkSession, d: String): String =
    graft.AnnSubstrate.getOrBuild(s, s"dsforget|$d/documents.parquet",
        protectNew = false) {
      val dir = graft.AnnSubstrate.deleteOnExit(java.nio.file.Files
        .createTempDirectory("graft_dsforget_state").toString)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      graft.streaming.DatasheetStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 === 0), 0L)
      graft.streaming.DatasheetStateStream.update(dir)(
        docs.filter(col("doc_id") % 2 =!= 0), 1L)
      val tomb = docs.filter(graft.operators.Sampling.tombstoned(col("doc_id")))
      graft.streaming.DatasheetStateStream.forget(dir)(tomb, 2L)
      graft.streaming.DatasheetStateStream.forget(dir)(tomb, 2L) // replay no-op
      graft.streaming.DatasheetStateStream.foldDeltas(s, dir)
      dir
    }

  /** q153: right-to-be-forgotten cascade accounting over the doubled
    * (q32-fixture) corpus — one row per derived artifact with the
    * affected/total counts a deletion would touch. */
  def tombstoneCascade(docs: DataFrame, embs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    val doubled = base.union(
      base.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    // the tombstone flag is a pure function of doc_id, so each leg
    // derives it over its own COLUMN-PRUNED scan instead of reading a
    // shared checkpoint (r18 — the r17 form eagerly materialized the
    // doubled corpus WITH TEXT for four legs of which only the
    // fingerprint leg reads text: at 100 TB that checkpoint is a full
    // corpus-text copy bought to save three doc_id-only scans, and at
    // bench scale it was one more construction action)
    val tomb = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
    val tIds = doubled.select(col("doc_id")).withColumn("tomb", tomb)
    val tombIds = tIds.filter(col("tomb")).select(col("doc_id"))
    def row(label: String, affected: Column, total: Column)(src: DataFrame) =
      src.select(lit(label).as("artifact"), affected.cast("bigint").as("affected"),
        total.cast("bigint").as("total"))
    // documents
    val dd = row("documents", col("a"), col("n"))(
      tIds.agg(sum(when(col("tomb"), 1L).otherwise(0L)).as("a"),
        count(lit(1)).as("n")))
    // exact-dup groups (q32's fingerprint)
    val g = doubled.withColumn("tomb", tomb)
      .select(col("doc_id"), col("tomb"),
        md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
          .as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("tomb"), 1L).otherwise(0L)).as("nt"),
        min(col("doc_id")).as("mn"),
        min(when(col("tomb"), col("doc_id"))).as("mnt"))
    val ga = g.agg(
      sum(when(col("nt") === col("n"), 1L).otherwise(0L)).as("erased"),
      sum(when(col("nt") > 0 && col("nt") < col("n")
        && col("mn") === col("mnt"), 1L).otherwise(0L)).as("recanon"),
      count(lit(1)).as("groups"))
      .localCheckpoint(true) // one row, two artifact readers
    val ge = row("dup_groups_erased", col("erased"), col("groups"))(ga)
    val gr = row("dup_groups_recanonicalized", col("recanon"), col("groups"))(ga)
    // packed windows (q145's offsets over the doubled corpus)
    val packed = Sampling.contextPacking(doubled, windowTokens = 512,
        bucketDocs = 64)
      .select(col("doc_id"), col("start_window"), col("end_window"))
      .localCheckpoint(true)
    val tw = packed.agg((max(col("end_window")) + 1).as("tot"))
    val aw = packed
      .join(tombIds, Seq("doc_id"), "left_semi")
      .select(explode(sequence(col("start_window"), col("end_window")))
        .as("w"))
      .agg(countDistinct(col("w")).as("aff"))
    val pwRow = row("packed_windows", col("aff"), col("tot"))(
      aw.crossJoin(broadcast(tw)))
    // embeddings (1:1 on vec_id)
    val ea = embs.select(col("vec_id"))
      .join(tombIds, col("vec_id") === col("doc_id"), "left_semi")
      .agg(count(lit(1)).as("aff"))
    val et = embs.agg(count(lit(1)).as("tot"))
    val eRow = row("embeddings", col("aff"), col("tot"))(
      ea.crossJoin(broadcast(et)))
    dd.unionByName(ge).unionByName(gr).unionByName(pwRow).unionByName(eRow)
      .select(col("artifact"), col("affected"), col("total"),
        (col("affected").cast("double") / col("total").cast("double"))
          .as("share"))
      .orderBy(col("artifact"))
  }
}
