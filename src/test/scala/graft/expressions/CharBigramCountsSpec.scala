package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the compiled CharBigramCounts expression to the interpreted
  * formulation it replaced in q122 (`transform(sequence(1, len-1),
  * i -> substr(text, i, 2))`) — aggregated counts must be identical on
  * the real corpus, since the q122 oracle counts with substr semantics.
  */
class CharBigramCountsSpec extends SparkSpec {

  private def compiledCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(CharBigramCounts(col("text"))).as("e"))
      .groupBy(col("e.g").as("g")).agg(sum(col("e.c")).as("c"))

  private def interpretedCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(when(length(col("text")) >= 2,
        expr("transform(sequence(1, length(text) - 1), i -> substr(text, i, 2))"))
      .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))

  test("corpus-level counts match the interpreted substr formulation bit-exactly") {
    val docs = graft.Tables.documents(spark, sf0001).select(col("text"))
    val a = compiledCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = interpretedCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("edge shapes: empty, single char, repeated text, code points above the BMP") {
    import spark.implicits._
    val docs = Seq("", "a", "aaaa", "ab", "x😀y").toDF("text")
    val got = compiledCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aaaa" -> aa×3; "ab" -> ab×1; the emoji doc pairs by CODE POINT:
    // (x,emoji) and (emoji,y) — never a half-surrogate bigram
    assert(got("aa") == 3L && got("ab") == 1L)
    assert(got("x😀") == 1L && got("😀y") == 1L)
    assert(!got.keys.exists(g => g.length == 2 &&
      Character.isHighSurrogate(g.charAt(0)) && !Character.isLowSurrogate(g.charAt(1))),
      "no broken surrogate pairs")
    assert(got.values.sum == 3 + 1 + 2, "empty and 1-char docs contribute nothing")
  }

  test("null text yields a null array, not a crash") {
    import spark.implicits._
    val docs = Seq(Some("ab"), None).toDF("text")
    val n = docs.select(CharBigramCounts(col("text")).as("a"))
      .filter(col("a").isNull).count()
    assert(n == 1)
  }
}
