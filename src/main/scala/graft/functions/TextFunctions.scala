package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (dedup, quality,
  * language-ID, fingerprinting). Everything is built-in `functions._` /
  * higher-order expressions — codegen'd, no UDFs — so the hot path stays
  * inside whole-stage codegen at any scale.
  */
object TextFunctions {

  /** Lowercase, collapse non-alphanumerics to single spaces, trim — the
    * canonical normalization used by every fingerprint/dedup operator. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the trimmed text. */
  def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish tokens: letter runs, digit runs, single other symbols. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def regexTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(TokenPattern), lit(0))

  /** Distinct n-word shingles (default 3) over whitespace tokens; texts
    * shorter than n tokens yield an empty array. */
  def shingles(c: Column, n: Int = 3): Column = {
    val ws = wsTokens(c)
    val grams = transform(sequence(lit(0), size(ws) - n), i =>
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))
    when(size(ws) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** MD5 content fingerprint of the normalized text — engine-independent
    * (oracle-comparable), the key for exact dedup. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Rolling (Karp-Rabin-style polynomial) hash over whitespace tokens:
    * acc = (acc * 31 + xxhash64(token)) mod p, with p = 1e9+7 so the
    * intermediate never overflows a Long under ANSI arithmetic. Order-
    * sensitive by design — equal only for equal token streams. */
  def rollingHash(c: Column): Column = {
    val p = lit(1000000007L)
    aggregate(wsTokens(c), lit(0L),
      (acc, w) => pmod(acc * lit(31L) + pmod(xxhash64(w), p), p))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * xxhash64(token), computed by the codegen'd
    * [[graft.expressions.SimHash64]] single-pass expression. */
  def simhash64(c: Column): Column =
    graft.expressions.SimHash64(transform(wsTokens(c), w => xxhash64(w)))

  /** Interpreted reference formulation (64 aggregate folds) — kept to pin
    * the codegen expression's semantics in tests. */
  def simhash64Hof(c: Column): Column = {
    val hashes = transform(wsTokens(c), w => xxhash64(w))
    val bits = (0 until 64).map { b =>
      val mask = lit(1L << b)
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= 0L, 1).otherwise(-1))
      when(vote > 0, mask).otherwise(lit(0L))
    }
    bits.reduce((a, z) => a.bitwiseOR(z))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ---- portable (md5-derived) variants -------------------------------------
  // xxhash64 is the production token hash (faster, seeded), but it exists only
  // in Spark; these md5-derived twins have bit-identical formulations in ANSI
  // SQL/DuckDB, which is what lets q35 carry a full value-hash oracle instead
  // of a rows-only check. Same shapes, same costs (one md5 per token).

  /** Per-token md5 hex strings — ONE md5 per token. HOF lambda bodies get
    * no subexpression elimination, so every md5-derived signature should
    * be built from this shared array rather than hashing inside its own
    * lambda (q35 computed 3 md5/token before this refactor). */
  def md5TokenHex(c: Column): Column = transform(wsTokens(c), w => md5(w))

  /** 64-bit token hashes from the first 16 hex chars of each md5: the two
    * 32-bit halves are parsed separately (each fits a signed long) and
    * recombined bitwise, so no 64-bit unsigned parse is ever needed. */
  def tokenHashesFromHex(hexes: Column): Column =
    transform(hexes, hx =>
      shiftleft(conv(substring(hx, 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(hx, 9, 8), 16, 10).cast("long")))

  /** SimHash-64 over 64-bit token hashes, rendered as a 16-char lowercase
    * hex string (the cross-engine-stable encoding for a value whose top
    * bit may be set). */
  def simhashHexFromHashes(th: Column): Column =
    lower(lpad(hex(graft.expressions.SimHash64(th)), 16, "0"))

  /** Karp-Rabin rolling hash over the same 64-bit token hashes:
    * acc = (acc * 31 + (hi32(h) mod p)) mod p, p = 1e9+7 — hi32(h) is
    * exactly the first-8-hex-chars value the DuckDB twin parses.
    * Order-sensitive like [[rollingHash]], but portable. */
  def rollingFromHashes(th: Column): Column = {
    val p = lit(1000000007L)
    aggregate(th, lit(0L),
      (acc, h) => pmod(acc * lit(31L) + pmod(shiftrightunsigned(h, 32), p), p))
  }

  /** Convenience single-column forms (each rehashes the tokens; when
    * deriving BOTH signatures, share [[md5TokenHex]] as q35 does). */
  def simhashHex(c: Column): Column =
    simhashHexFromHashes(tokenHashesFromHex(md5TokenHex(c)))
  def rollingHashMd5(c: Column): Column =
    rollingFromHashes(tokenHashesFromHex(md5TokenHex(c)))
}
