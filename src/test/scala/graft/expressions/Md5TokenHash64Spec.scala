package graft.expressions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions.{md5TokenHex, tokenHashesFromHex}

/** The compiled md5 token hasher must be BIT-EQUAL to the HOF
  * compositions it replaces: these hashes feed simhash signatures the
  * DuckDB oracle re-derives from md5 hex, so any divergence — token
  * splitting, digest parsing, hex case — breaks oracle parity, not just
  * performance. */
class Md5TokenHash64Spec extends SparkSpec {
  import spark.implicits._

  test("word mode matches tokenHashesFromHex(md5TokenHex(_)) on the corpus") {
    val docs = Tables.documents(spark, sf001)
    val both = docs.select(
      Md5TokenHash64.words(col("text")).as("fast"),
      tokenHashesFromHex(md5TokenHex(col("text"))).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("word mode matches on adversarial whitespace") {
    // Spark trim strips spaces only; split keeps trailing empty tokens —
    // the two subtle behaviors the compiled loop replicates by hand
    val fixtures = Seq("", " ", "  a  ", "\ta b\n", "a\n", "\n a",
      "a  b\t\tc", " \t mixed \n ends \t ", "single")
      .toDF("text")
    val both = fixtures.select(
      Md5TokenHash64.words(col("text")).as("fast"),
      tokenHashesFromHex(md5TokenHex(col("text"))).as("ref"))
    val bad = both.filter(col("fast") =!= col("ref")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("chunk mode matches the hex-window transform on the corpus") {
    val blobs = Tables.documents(spark, sf001)
      .select(to_binary(col("text"), lit("utf-8")).as("blob"))
      .filter(length(col("blob")) >= 4)
      .withColumn("hx", hex(col("blob")))
    val both = blobs.select(
      Md5TokenHash64.chunks(col("blob"), 4).as("fast"),
      tokenHashesFromHex(
        expr("transform(sequence(1, int(length(hx) div 8))," +
          " i -> md5(substring(hx, (i-1)*8 + 1, 8)))")).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("word mode matches the HOF composition on generated adversarial strings") {
    // raw ScalaCheck with fixed seeds (PropSpec convention): random mixes
    // of words, every whitespace class, unicode letters, and empty runs —
    // the population where a hand-rolled trim/split replication breaks
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", " ", "　"),
      Gen.oneOf("čeština", "日本語", "emoji🙂bit", "a-b_c", ""))
    val textGen = Gen.listOfN(12, piece).map(_.mkString)
    val texts = (1L to 200L).map(seed =>
      textGen.pureApply(Gen.Parameters.default, Seed(seed)))
    val df = texts.toDF("text")
    val bad = df.select(col("text"),
        Md5TokenHash64.words(col("text")).as("fast"),
        tokenHashesFromHex(md5TokenHex(col("text"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .collect()
    assert(bad.isEmpty,
      s"compiled/HOF divergence on: ${bad.take(3).map(_.getString(0)).mkString(" | ")}")
  }

  test("chunk mode: tail bytes short of a full chunk are dropped") {
    val one = Seq(Array[Byte](1, 2, 3, 4, 5)).toDF("blob")
    val got = one.select(Md5TokenHash64.chunks(col("blob"), 4)).head.getSeq[Long](0)
    assert(got.length == 1, "5 bytes at chunk 4 must yield exactly one chunk")
    val empty = Seq(Array[Byte](1, 2, 3)).toDF("blob")
      .select(Md5TokenHash64.chunks(col("blob"), 4)).head.getSeq[Long](0)
    assert(empty.isEmpty, "sub-chunk payload must yield no hashes")
  }
}
