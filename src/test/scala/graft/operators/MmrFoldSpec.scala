package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the in-row MMR fold (the registered q136 path) to the round-9
  * DataFrame-rounds formulation — same greedy chain, zero scheduling
  * barriers. The rounds version is the semantic reference (it is the
  * shape the DuckDB unrolled-CTE oracle mirrors); the fold must match
  * it row for row, bit for bit. */
class MmrFoldSpec extends SparkSpec {

  private val queryIds = Seq(0L, 100L, 200L)

  test("in-row fold == DataFrame rounds, row for row (registered q136 shape)") {
    val emb = Tables.embeddings(spark, sf0001)
    val cols = Seq("query_id", "step", "vec_id", "relevance", "mmr_score")
    val fold = Similarity.mmrTopK(emb, queryIds, k = 5, fromN = 20, lambda = 0.7)
      .select(cols.map(col): _*)
    val rounds = Similarity.mmrTopKRounds(emb, queryIds, k = 5, fromN = 20,
        lambda = 0.7)
      .select(cols.map(col): _*)
    assert(fold.exceptAll(rounds).isEmpty && rounds.exceptAll(fold).isEmpty,
      "in-row MMR fold diverged from the DataFrame-rounds formulation")
    assert(fold.count() == queryIds.size * 5L)
  }

  test("fold handles a page smaller than k: picks stop at the page size") {
    // fromN = 3 < k = 5: each query's page has 3 candidates, so steps
    // 4 and 5 have nothing to pick — the fold must emit exactly 3 rows
    // per query (null picks dropped), matching the rounds formulation
    val emb = Tables.embeddings(spark, sf0001)
    val cols = Seq("query_id", "step", "vec_id", "relevance", "mmr_score")
    val fold = Similarity.mmrTopK(emb, queryIds, k = 5, fromN = 3, lambda = 0.7)
      .select(cols.map(col): _*)
    val rounds = Similarity.mmrTopKRounds(emb, queryIds, k = 5, fromN = 3,
        lambda = 0.7)
      .select(cols.map(col): _*)
    assert(fold.exceptAll(rounds).isEmpty && rounds.exceptAll(fold).isEmpty,
      "small-page fold diverged from the rounds formulation")
    assert(fold.count() == queryIds.size * 3L)
    val steps = fold.select(col("step")).distinct().collect().map(_.getInt(0)).sorted
    assert(steps.sameElements(Array(1, 2, 3)), s"unexpected steps: ${steps.toSeq}")
  }
}
