package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input behavior of the round-5 operators: empty corpora,
  * single documents, and empty text must produce empty (or sane) results,
  * not crashes — at 100 TB a partition-pruned read or a filtered branch
  * regularly hands an operator zero rows. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))

  private val emptyDocs = docs()

  test("simhash near-dup pipeline is empty-safe and single-doc-safe") {
    assert(Dedup.simhashNearDupPairs(emptyDocs, 8).isEmpty)
    assert(Dedup.simhashNearDupPairs(docs((1L, "only one document here")), 8).isEmpty)
    assert(Dedup.nearDupSurvivors(emptyDocs, 8).isEmpty)
    assert(Dedup.nearDupSurvivors(docs((1L, "alpha beta gamma")), 8).isEmpty)
  }

  test("contamination is empty-safe and handles a train-only corpus") {
    assert(Dedup.contamination(emptyDocs).isEmpty)
    // doc_id 0 hashes into the train bucket: no test docs → empty, no crash
    assert(Dedup.contamination(docs((0L, "alpha beta gamma delta"))).isEmpty)
  }

  test("empty-text documents flow through the text operators") {
    val d = docs((1L, ""), (2L, "some real text here and more"))
    // shingle machinery: empty text yields no shingles, pipeline survives
    assert(Dedup.simhashNearDupPairs(d, 8).count() >= 0)
    // repetition filter's token counting: an empty text still contributes
    // one row per doc (the registry binds to the testdata path, so the
    // q79 shape is re-derived here on the tiny frame)
    val tf = d.select($"doc_id", explode(
        graft.functions.TextFunctions.wsTokens(lower($"text"))).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    assert(tf.filter($"doc_id" === 1L).count() == 1) // the empty token
  }

  test("chunk dedup is empty-safe and single-word-safe") {
    assert(Dedup.chunkDedup(emptyDocs.select($"doc_id", $"text")).isEmpty)
    val one = Dedup.chunkDedup(docs((1L, "solo")).select($"doc_id", $"text"))
      .as[(Long, Long, Long, String)].collect()
    assert(one.toSeq == Seq((1L, 1L, 1L, "solo")))
  }

  test("chunk dedup reports a null-text doc as a coherent (0, 0, empty) row") {
    val d = Seq((1L, "real words here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dedup.chunkDedup(d).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 1L, 1L, "real words here"), (2L, 0L, 0L, "")))
  }

  test("mixture weights on an empty or single-source corpus degrade sanely") {
    assert(Sampling.mixtureWeights(emptyDocs).isEmpty)
    // one source: already at target → weight exactly 1
    val one = Sampling.mixtureWeights(docs((1L, "a b c"), (2L, "d e")))
      .select($"weight").as[Double].collect()
    assert(one.toSeq == Seq(1.0))
  }

  test("bloom built from zero keys rejects everything; probes stay null-safe") {
    val noKeys = Seq.empty[Long].toDF("k")
    val bits = Scale.Bloom.build(noKeys, "k")
    assert(bits.forall(_ == 0L))
    val probe = Seq(1L, 42L, 7L).toDF("k")
    assert(probe.filter(Scale.Bloom.mightContain(bits, $"k")).isEmpty)
  }

  test("EWMA variants are empty-safe") {
    val emptyEvents = Seq.empty[(Long, Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventWindows.ewmaSecondarySort(emptyEvents).isEmpty)
    assert(graft.streaming.EwmaStream.ewmaStages(emptyEvents).isEmpty)
  }

  test("session conversion is empty-safe end to end") {
    val emptyEvents = Seq.empty[(Long, Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    val sessions = graft.streaming.SessionStream.sessions(emptyEvents)
    assert(sessions.isEmpty)
    assert(graft.streaming.SessionStream.dailyConversion(sessions).isEmpty)
  }

  test("sized bloom survives a one-key build and still prunes") {
    val bits = Scale.Bloom.build(Seq(42L).toDF("k"), "k")
    assert(bits.length * 64 == Scale.Bloom.minBits) // floor size for tiny builds
    assert(Seq(42L).toDF("k").filter(Scale.Bloom.mightContain(bits, $"k")).count() == 1)
    assert(Seq(43L, 44L, 45L).toDF("k")
      .filter(Scale.Bloom.mightContain(bits, $"k")).isEmpty)
  }
}
