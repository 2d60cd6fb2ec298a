package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Inverted index keyed by a 64-bit shingle hash (single-eval
    * [[graft.expressions.ShingleHash64]]): the join/shuffle carries
    * 8-byte longs instead of ~30-char strings, and the tokenize/window
    * loop runs compiled, not per-element interpreted. Hash collisions
    * would be needed to change a Jaccard count (~2⁻⁶⁴ per shingle pair)
    * — the standard trade at scale. */
  private def hashedShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.expressions.ShingleHash64(col("text"))).as("h"))

  /** Exact dedup: keep the lowest doc_id per normalized-content
    * fingerprint, count copies. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Connected components over candidate duplicate pairs (`d1`, `d2`) —
    * the stage that turns pairwise near-dup hits into dedup GROUPS with
    * one canonical survivor each. Iterative min-label propagation: every
    * vertex starts as its own label and repeatedly adopts the smallest
    * label among itself and its neighbors, so each component converges to
    * its minimum vertex id. Iterations are one equi-join + one groupBy
    * each, and the labels frame is `localCheckpoint`ed per round to keep
    * lineage flat (the IVF lesson). Convergence is detected by the sum of
    * labels (strictly decreasing until fixpoint), checked on the driver.
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
      .select(col("v"), col("v").as("component")).localCheckpoint()
    var lastSum = labelSum(labels)
    var iter = 0
    var converged = labels.isEmpty
    while (iter < maxIters && !converged) {
      val pushed = edges.join(labels, edges("src") === labels("v"))
        .select(col("dst").as("v"), col("component"))
      labels = labels.union(pushed)
        .groupBy(col("v")).agg(min(col("component")).as("component"))
        .localCheckpoint()
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

  /** Near-duplicate pairs by n-gram Jaccard ≥ threshold, via the
    * inverted-index join on hashed shingles (only co-shingle pairs are
    * ever scored; the shuffle key is an 8-byte long). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // `ex` appears in three plan branches (both join sides + sizes) that
    // shuffle on different keys, so no exchange reuse applies and the
    // shingle hashing runs 3×. That's deliberate: ShingleHash64 is a
    // cheap compiled per-row pass, and recomputing beats caching the
    // exploded index (which would be far larger than the input) at scale.
    val ex = hashedShingles(docs)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard",
        col("inter") * lit(1.0d) / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** MinHash signatures, one row per doc with a k-element signature
    * array — computed per-row by [[graft.expressions.MinHashSig]]: no
    * explode, no shuffle; signature construction is embarrassingly
    * parallel, exactly what you want at 100 TB. */
  def minhashSignatures(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.expressions.MinHashSig(col("text"), k).as("sig"))

  /** LSH candidate pairs: documents agreeing on at least one band of
    * `rowsPerBand` consecutive minhashes (k/rowsPerBand bands). The
    * bucket join key is (band, concatenated band signature). */
  def minhashCandidates(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val nBands = k / rowsPerBand
    val sigs = minhashSignatures(docs, k)
    val bandStructs = (0 until nBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

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
      "Near-dup pairs by 3-gram Jaccard >= 0.3 via inverted-index join — only co-shingle pairs are ever scored.") {
      (s, d) =>
        ngramJaccardPairs(Tables.documents(s, d), 0.3).orderBy(col("d1"), col("d2"))
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
        minhashCandidates(Tables.documents(s, d)).orderBy(col("d1"), col("d2"))
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
  )
}
