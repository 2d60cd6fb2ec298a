package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q178's max-run fold: the in-row higher-order pass must compute the
  * exact gaps-and-islands statistic, and the rollup must behave on
  * hand-built degenerate fixtures. */
class RepetitionRunsSpec extends SparkSpec {

  test("compiled == in-row fold == gaps-and-islands windows on the corpus") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val fold = docs.select(col("doc_id"),
        TextAnalysis.maxRunCol(graft.functions.TextFunctions.wsTokens(col("text")))
          .as("max_run"))
    val compiled = docs.select(col("doc_id"),
        graft.expressions.MaxTokenRun(col("text")).as("max_run"))
    val islands = TextAnalysis.maxRunIslands(docs)
    assert(fold.exceptAll(islands).isEmpty && islands.exceptAll(fold).isEmpty,
      "fold and islands formulations disagree")
    assert(compiled.exceptAll(fold).isEmpty && fold.exceptAll(compiled).isEmpty,
      "compiled MaxTokenRun and the fold disagree")
  }

  test("compiled tokenization edges match split(trim(text), \\s+) exactly") {
    import spark.implicits._
    // trim strips 0x20 only; split keeps leading/trailing empty tokens
    // (limit -1); empty text is one "" token. These are the rows where
    // a hand-rolled tokenizer would silently drift from the fold.
    val fix = Seq(
      (1L, ""),              // [""] → 1
      (2L, "   "),           // spaces trim to "" → [""] → 1
      (3L, "\ta a"),         // leading tab: ["", "a", "a"] → 2
      (4L, "a a\n"),         // trailing newline: ["a", "a", ""] → 2
      (5L, "a\t\ta b"),      // multi-ws separator is ONE split → run 2
      (6L, " \n \n "),       // trims to "\n \n" = ONE ws run → ["", ""] → 2
      (7L, "x X x")          // case-sensitive: run 1
    ).toDF("doc_id", "text")
    val fold = fix.select(col("doc_id"),
      TextAnalysis.maxRunCol(graft.functions.TextFunctions.wsTokens(col("text")))
        .as("max_run"))
    val compiled = fix.select(col("doc_id"),
      graft.expressions.MaxTokenRun(col("text")).as("max_run"))
    assert(compiled.exceptAll(fold).isEmpty && fold.exceptAll(compiled).isEmpty,
      "compiled MaxTokenRun drifts from the fold on whitespace edges")
    val got = compiled.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 2, 6L -> 2,
      7L -> 1), s"unexpected runs: $got")
  }

  test("hand fixtures: runs counted exactly, flag threshold honored") {
    import spark.implicits._
    val fix = Seq(
      (1L, "A", "la la la la stop"),          // run 4 → flagged
      (2L, "A", "a b a b a b"),               // run 1
      (3L, "A", "x y y z"),                   // run 2 → not flagged at 3
      (4L, "B", "w w w"),                     // run 3 → flagged exactly at cut
      (5L, "B", "")                           // empty text: one "" token, run 1
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.repetitionRuns(fix).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").getLong(1) == 3 && got("A").getLong(2) == 1)
    assert(got("A").getLong(4) == 4, "A's worst run is the la-la-la-la 4")
    assert(got("B").getLong(1) == 2 && got("B").getLong(2) == 1,
      "run of exactly 3 must flag; empty text must not")
    assert(got("B").getDouble(3) == 0.5)
    assert(got("B").getDouble(5) == 2.0, "mean of max-runs 3 and 1")
  }

  test("a repeated PHRASE is not a token run: ab ab ab stays at 1") {
    import spark.implicits._
    val fix = Seq((1L, "A", "ab cd ab cd ab cd")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.repetitionRuns(fix).collect().head
    assert(r.getLong(4) == 1,
      "alternating phrase repetition is q100/q169's job, not a token run")
  }
}
