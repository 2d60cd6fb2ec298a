package graft

/** Driver-computed constants shared between the ENGINE plan and the DuckDB
  * ORACLE plan — the q166 S-curve pattern generalized to values that depend
  * on the corpus being verified (and therefore cannot be baked in at
  * registration time).
  *
  * The auto-nlist family (q112/q138/q150/q155/q165/q174) resolves its list
  * count as `autoNlist(count(embeddings))` at run time
  * (Similarity.resolveNlist). Historically the oracle pinned 8 lists — the
  * resolved value at the gate SFs — which made the oracle stop proving the
  * registered form exactly at the first SF where auto-nlist grows (sf0.1,
  * the round-13 verdict's top residual). [[Verify]] now publishes the
  * corpus's embeddings row count here BEFORE `SparkEntry.oracleSql` is
  * evaluated, so the oracle builders embed `autoNlist(n)` — the SAME
  * function of the SAME table's count the engine resolves — as a literal
  * in the unrolled k-means CTE chain. Engine and oracle agree at every SF
  * by construction; there is no second copy of the sizing rule.
  *
  * Unset (tests, Bench, TimeQ — nothing there consumes oracle SQL) the
  * builders fall back to the historical 8, keeping the emitted SQL
  * byte-identical to the round-13 record.
  */
object OracleCtx {
  @volatile private var embCount: Option[Long] = None

  /** Row count of `<sfDir>/embeddings.parquet` for the corpus being
    * verified; None outside a Verify run. */
  def embeddingsCount: Option[Long] = embCount

  def setEmbeddingsCount(n: Long): Unit = embCount = Some(n)

  /** Test hook — a spec that sets the count must clear it, or every
    * later-evaluated oracle in the same JVM would silently re-scale. */
  def clear(): Unit = embCount = None
}
