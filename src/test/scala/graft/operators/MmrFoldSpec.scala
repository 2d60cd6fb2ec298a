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

  test("NaN relevance (NaN-valued vector): fold == rounds, NaN picked first") {
    // A zero-norm vector can NOT silently reach the score: ANSI mode
    // (the session default) turns its 0/0 cosine into a loud
    // DIVIDE_BY_ZERO. The silent path is a NaN VALUE in the input
    // embedding — NaN/NaN is not a division by zero, so the cosine
    // propagates NaN into relevance. Spark SQL comparisons use the
    // TOTAL order on doubles (NaN greater than everything, NaN = NaN
    // true) in both the rounds window sort AND the fold's keep-better
    // `>` / `===` — so the NaN candidate ranks first deterministically
    // in both formulations, and once selected it drives every later
    // step's penalty (and thus score) to NaN, exercising the NaN==NaN
    // vec_id tie-break too. Pinned because the IEEE intuition (NaN
    // comparisons all false) would predict a fold/rounds divergence.
    import spark.implicits._
    val emb = ((0L until 12L).map { i =>
      (i, Array.tabulate(4)(d => math.sin(i * 0.7 + d).toFloat))
    } :+ (99L, Array.fill(4)(Float.NaN))).toDF("vec_id", "embedding")
    val qids = Seq(0L)
    val cols = Seq("query_id", "step", "vec_id", "relevance", "mmr_score")
    val fold = Similarity.mmrTopK(emb, qids, k = 4, fromN = 20, lambda = 0.7)
      .select(cols.map(col): _*)
    val rounds = Similarity.mmrTopKRounds(emb, qids, k = 4, fromN = 20,
        lambda = 0.7)
      .select(cols.map(col): _*)
    assert(fold.exceptAll(rounds).isEmpty && rounds.exceptAll(fold).isEmpty,
      "NaN-score fold diverged from the rounds formulation")
    val first = fold.filter(col("step") === 1).select(col("vec_id"))
      .collect().map(_.getLong(0))
    assert(first.sameElements(Array(99L)),
      s"the NaN-relevance candidate must win step 1: ${first.toSeq}")
  }
}
