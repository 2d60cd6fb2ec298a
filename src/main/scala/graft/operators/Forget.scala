package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Q

/** The deletion CERTIFICATE — the compliance artifact the whole
  * q199–q218 family exists to produce: after right-to-be-forgotten has
  * executed against every maintained state layout, one table stating
  * the surviving population of each artifact, verified cross-engine
  * against an INDEPENDENT recomputation from the raw corpus with the
  * tombstone rule applied (q80's chain for the shingle members, q103's
  * for the vocabulary, q72's for the funnel, q185's doubled fixture for
  * the assets, the survivor doc count for the repacked q145/q187
  * ledger, the per-machine record counts for all five event sinks,
  * the datasheet's surviving vocabulary, the IVF index's
  * compressed PQ-codes tier, and the drift alarm's surviving
  * per-(source, dim) contribution mass). A GDPR Article-17 review doesn't take "we ran the
  * delete" on faith — it takes evidence that what remains is EXACTLY
  * the survivors, which is a stronger claim than "no tombstoned key
  * remains" (that alone would pass if the forget had also eaten
  * innocent rows). Every leg reads a forgotten-state dir the q199–q218
  * builders already memoized, so the certificate costs twenty-two bounded
  * state aggregates — the corpus is never rescanned at read time.
  *
  * Hash-domain note: the vocabulary, datasheet-vocabulary and shingle
  * legs count DISTINCT 64-bit hashes (md5-derived and xxhash64 domains
  * respectively) while the oracle counts distinct strings — equal under
  * the family's documented injectivity convention (the 2^-64 collision
  * trade, policed by this very gate). vocab_terms and datasheet_vocab
  * deliberately certify the SAME truth (distinct surviving words) from
  * two independently maintained artifacts in two different hash
  * domains — a cross-artifact consistency check for free. The IVF index
  * files two rows: `lists/` survivors and the compressed `codes/` tier
  * (4 rows/vector — forget must scrub both or ADC serving resurrects
  * deleted vectors). */
object Forget {

  private def surv(rel: String, key: String): String =
    s"(SELECT * FROM $rel WHERE substr(md5(CAST($key AS VARCHAR)), 1, 1) <> '" +
      Sampling.TombstoneHex + "')"

  private def q206OracleSql: String =
    s"""WITH sdocs AS (SELECT * FROM ${surv("documents", "doc_id")}),
       |semb AS (SELECT * FROM ${surv("embeddings", "vec_id")}),
       |doubled AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 3000000, text FROM documents),
       |sassets AS (SELECT * FROM ${surv("doubled", "doc_id")}),
       |strain AS (
       |  SELECT * FROM sdocs
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'),
       |sevents AS (SELECT * FROM ${surv("events", "user_id")}),
       |tsh AS (
       |  SELECT unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |    for i in range(1, len(w) - 1)])) AS sh
       |  FROM (SELECT string_split_regex(trim(text), '\\s+') AS w FROM strain)),
       |lw AS (
       |  SELECT DISTINCT doc_id, w FROM (
       |    SELECT doc_id,
       |      unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |    FROM sdocs) t),
       |vw AS (
       |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM sdocs),
       |bgp AS (
       |  SELECT DISTINCT struct_extract(p, 'w1') AS w1,
       |    struct_extract(p, 'w2') AS w2
       |  FROM (
       |    SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
       |                   FOR i IN range(1, len(w))]) AS p
       |    FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
       |          FROM sdocs))),
       |fv AS (
       |  SELECT user_id, min(ts) AS t1 FROM sevents
       |  WHERE event_type = 'view' GROUP BY user_id),
       |fc AS (
       |  SELECT e.user_id, min(e.ts) AS t2 FROM sevents e
       |  JOIN fv ON e.user_id = fv.user_id
       |  WHERE e.event_type = 'click' AND e.ts > fv.t1 GROUP BY e.user_id),
       |fp AS (
       |  SELECT e.user_id, min(e.ts) AS t3 FROM sevents e
       |  JOIN fc ON e.user_id = fc.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts > fc.t2 GROUP BY e.user_id),
       |smark AS (
       |  SELECT CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |      IS NULL OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
       |      >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS ns
       |  FROM sevents)
       |SELECT artifact, n_rows FROM (
       |  SELECT 'asset_digests' AS artifact,
       |    CAST((SELECT count(*) FROM sassets) AS BIGINT) AS n_rows
       |  UNION ALL SELECT 'asset_paysigs', (SELECT count(*) FROM sassets
       |    WHERE octet_length(encode(text)) >= 4)
       |  UNION ALL SELECT 'bigram_pairs',
       |    (SELECT count(*) FROM sevents)
       |      - (SELECT count(DISTINCT user_id) FROM sevents)
       |  UNION ALL SELECT 'blacklist_docs', (SELECT count(*) FROM sdocs)
       |  UNION ALL SELECT 'centroid_mass', 64 * (SELECT count(*)
       |    FROM semb JOIN sdocs ON sdocs.doc_id = semb.vec_id)
       |  UNION ALL SELECT 'datasheet_vocab', (SELECT count(DISTINCT w) FROM vw)
       |  UNION ALL SELECT 'ewma_days', (SELECT count(*) FROM
       |    (SELECT DISTINCT user_id, CAST(ts AS DATE) FROM sevents))
       |  UNION ALL SELECT 'funnel_stages',
       |    (SELECT count(*) FROM fv) + (SELECT count(*) FROM fc)
       |      + (SELECT count(*) FROM fp)
       |  UNION ALL SELECT 'ivf_codes', 4 * (SELECT count(*) FROM semb)
       |  UNION ALL SELECT 'ivf_lists', (SELECT count(*) FROM semb)
       |  UNION ALL SELECT 'lex_doclens', (SELECT count(DISTINCT doc_id) FROM lw)
       |  UNION ALL SELECT 'lex_pos_postings', (SELECT count(*) FROM vw)
       |  UNION ALL SELECT 'lex_postings', (SELECT count(*) FROM lw)
       |  UNION ALL SELECT 'lex_token_mass', (SELECT count(*) FROM vw)
       |  UNION ALL SELECT 'lexdocs', (SELECT count(*) FROM sdocs)
       |  UNION ALL SELECT 'lm_bigrams', (SELECT count(*) FROM bgp)
       |  UNION ALL SELECT 'lsh_sigs', (SELECT count(*) FROM semb)
       |  UNION ALL SELECT 'packing_ledger_docs', (SELECT count(*) FROM sdocs)
       |  UNION ALL SELECT 'retention_weeks', (SELECT count(*) FROM
       |    (SELECT DISTINCT user_id, date_trunc('week', ts) FROM sevents))
       |  UNION ALL SELECT 'session_records',
       |    (SELECT CAST(sum(ns) AS BIGINT) FROM smark)
       |  UNION ALL SELECT 'shingle_df_members',
       |    (SELECT count(DISTINCT sh) FROM tsh)
       |  UNION ALL SELECT 'vocab_terms', (SELECT count(DISTINCT w) FROM vw))
       |ORDER BY artifact""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q206_deletion_certificate", q206OracleSql,
      "The deletion CERTIFICATE — what a compliance review actually files after a right-to-be-forgotten execution: one table, per maintained artifact, of the SURVIVING population, hash-verified against an independent cross-engine recomputation from the raw corpus with the tombstone rule applied (q80's shingle chain, q103's tokenizer, q72's funnel cascade, q185's doubled asset fixture). This is deliberately stronger than 'no tombstoned key remains' — that weaker check would pass a forget that also ate innocent rows; matching the exact survivor counts proves the deletion touched precisely its subjects across all twenty-two artifacts at once — including the packing ledger, whose deletion is the bounded suffix repack (q207), the one non-anti-join mechanic in the family — closing the q199-q218 family with the artifact a regulator reads. Every leg is a bounded aggregate over a forgotten-state dir the family's builders already memoized (states are built + forgotten once per session; the certificate re-reads them), so the read costs twenty-two state scans and the corpus is never rescanned. Hash-domain legs (vocab, datasheet vocab, shingles) count distinct 64-bit keys vs the oracle's distinct strings — the family's documented injectivity convention, policed by this gate; vocab_terms and datasheet_vocab certify the same truth from two independent artifacts in two hash domains, a free cross-artifact consistency check. Scale: at 100 TB the certificate is twenty-two index-read aggregates over fixed-width state rows — the audit is as cheap as the deletion, which is the operational requirement for running it after EVERY deletion batch, not just at year-end.") {
      (s, d) => {
        def leg(name: String, src: DataFrame, n: Column): DataFrame =
          src.agg(n.cast("bigint").as("n_rows"))
            .select(lit(name).as("artifact"), col("n_rows"))
        val rows = count(lit(1))
        leg("asset_digests", graft.streaming.AssetStateStream.digestState(s,
            Multimodal.servedForgottenAssetDir(s, d)), rows)
          .unionAll(leg("asset_paysigs", graft.streaming.AssetStateStream
            .sigState(s, Multimodal.servedForgottenAssetDir(s, d)), rows))
          .unionAll(leg("bigram_pairs", graft.streaming.ServedEventStreams
            .records(s, EventWindows.servedForgottenBigramDir(s, d)), rows))
          .unionAll(leg("blacklist_docs", graft.streaming.BoilerplateStateStream
            .docCountFromState(s, Dedup.servedForgottenBpStateDir(s, d)),
            sum(col("n_docs"))))
          // the drift alarm's substrate: surviving per-(source, dim)
          // contribution mass — 64·|survivors| iff the forget netted out
          // exactly the tombstoned vectors' components (exact integers,
          // so this is an identity, not an epsilon bound)
          .unionAll(leg("centroid_mass", graft.streaming.CentroidStateStream
            .centroidSumsState(s, Similarity.servedForgottenCentroidDir(s, d)),
            sum(col("n"))))
          .unionAll(leg("datasheet_vocab", graft.streaming.DatasheetStateStream
            .vocabularyState(s, Dedup.servedForgottenDatasheetDir(s, d)), rows))
          .unionAll(leg("ewma_days", graft.streaming.ServedEventStreams
            .records(s, EventWindows.servedForgottenEwmaDir(s, d)), rows))
          .unionAll(leg("funnel_stages", graft.streaming.ServedEventStreams
            .records(s, EventWindows.servedForgottenFunnelDir(s, d)), rows))
          .unionAll(leg("ivf_codes", graft.streaming.IvfStateStream
            .codeState(s, Similarity.servedForgottenIvfDir(s, d)), rows))
          .unionAll(leg("ivf_lists", graft.streaming.IvfStateStream
            .listState(s, Similarity.servedForgottenIvfDir(s, d)), rows))
          // the inverted index files ALL FIVE of its tables: surviving
          // per-doc lengths, positional postings (surviving token occurrences —
          // the phrase tier q224 serves), raw-term postings (exact distinct
          // (doc, term) pairs — no hash domain), the netted counter's
          // token mass (the r17 snapshot must equal the survivors'
          // total to the integer — the avgdl the index serves hangs off
          // it), and the registry BM25's N reads from
          .unionAll(leg("lex_doclens", graft.streaming.LexicalStateStream
            .doclensState(s, Similarity.servedForgottenLexicalDir(s, d)), rows))
          // the positional tier's surviving rows = the survivors' total
          // token count — the SAME truth lex_token_mass certifies from
          // the netted counter, here from the independent poslists
          // artifact (the vocab_terms/datasheet_vocab convention): the
          // two must agree or one tier's forget missed rows
          .unionAll(leg("lex_pos_postings", graft.streaming.LexicalStateStream
            .poslistsState(s, Similarity.servedForgottenLexicalDir(s, d)), rows))
          .unionAll(leg("lex_postings", graft.streaming.LexicalStateStream
            .postingsState(s, Similarity.servedForgottenLexicalDir(s, d)), rows))
          .unionAll(leg("lex_token_mass", graft.streaming.LexicalStateStream
            .lexstatsState(s, Similarity.servedForgottenLexicalDir(s, d)),
            sum(col("sum_dl"))))
          .unionAll(leg("lexdocs", graft.streaming.LexicalStateStream
            .lexdocsState(s, Similarity.servedForgottenLexicalDir(s, d)), rows))
          // the netted 2-D LM: distinct surviving net>0 pairs must
          // equal the survivors' distinct adjacent bigrams (hash domain
          // vs strings — the documented injectivity convention)
          .unionAll(leg("lm_bigrams", graft.streaming.CorpusStateStream
            .bigramLmState(s, TextAnalysis.servedForgottenBigramLmDir(s, d)),
            rows))
          .unionAll(leg("lsh_sigs", graft.streaming.LshStateStream
            .sigState(s, Similarity.servedForgottenLshDir(s, d)), rows))
          .unionAll(leg("packing_ledger_docs", graft.streaming.PackingStream
            .ledgerState(s, Sampling.servedForgottenPackingDir(s, d)), rows))
          .unionAll(leg("retention_weeks", graft.streaming.ServedEventStreams
            .records(s, EventWindows.servedForgottenRetentionDir(s, d)), rows))
          .unionAll(leg("session_records", graft.streaming.ServedEventStreams
            .records(s, EventWindows.servedForgottenSessionDir(s, d)), rows))
          .unionAll(leg("shingle_df_members", graft.streaming.CorpusStateStream
            .shingleDfState(s, Dedup.servedForgottenTrainShingleDir(s, d)), rows))
          .unionAll(leg("vocab_terms", graft.streaming.CorpusStateStream
            .vocabState(s, TextAnalysis.servedForgottenVocabStateDir(s, d)), rows))
          .orderBy(col("artifact"))
      }
    },
  )
}
