package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every state family stamps a layout marker at birth and refuses a
  * populated dir without one (r17): the boilerplate/datasheet evolution
  * mechanic generalized, so the NEXT layout change anywhere diffs a
  * version instead of re-opening the vintage-unknown hole. One case per
  * family: an unmarked populated dir (a pre-r17 vintage) is refused
  * loudly with the rebuild instruction on BOTH the read and the write
  * path, and a fresh dir stamps v1 and round-trips. (The lexical
  * family's v3 marker has its own cases in LexicalStateStreamSpec; the
  * bp/ds v2 markers in their suites.) */
class FormatMarkersSpec extends SparkSpec {

  private def docsDf = {
    val spark0 = spark
    import spark0.implicits._
    Seq((0L, "apple pear plum", "s0"), (1L, "apple banana", "s1"))
      .toDF("doc_id", "text", "source")
  }

  private def embDf = {
    val spark0 = spark
    import spark0.implicits._
    (0L until 8L).map(i => (i, Array.tabulate(64)(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding")
  }

  private case class Fam(
      name: String,
      probe: String,
      read: String => Unit,
      write: String => Unit)

  private def fams = Seq(
    Fam("corpus", "shingles",
      d => CorpusStateStream.shingleState(spark, d),
      d => CorpusStateStream.update(d)(docsDf, 0L)),
    Fam("vocab", "vocab",
      d => CorpusStateStream.vocabState(spark, d),
      d => CorpusStateStream.updateVocab(d)(docsDf, 0L)),
    Fam("shdf", "shdf",
      d => CorpusStateStream.shingleDfState(spark, d),
      d => CorpusStateStream.updateShingleDf(d)(docsDf, 0L)),
    Fam("lsh", "sigs",
      d => LshStateStream.sigState(spark, d),
      d => LshStateStream.update(d)(embDf, 0L)),
    Fam("asset", "digests",
      d => AssetStateStream.digestState(spark, d),
      d => AssetStateStream.update(d)(docsDf, 0L)),
    Fam("centroid", "cent",
      d => CentroidStateStream.centroidSumsState(spark, d),
      d => CentroidStateStream.update(d)(
        docsDf.select(col("source"))
          .crossJoin(embDf.limit(1).select(col("embedding"))), 0L)),
    Fam("packing", "ledger",
      d => PackingStream.ledgerState(spark, d),
      d => PackingStream.update(d)(docsDf, 0L)),
    Fam("ivf", "centroids",
      d => IvfStateStream.listState(spark, d),
      d => IvfStateStream.train(embDf, d, nlist = 8)),
    Fam("bigrams", "bigrams",
      d => CorpusStateStream.bigramLmState(spark, d),
      d => CorpusStateStream.updateBigrams(d)(docsDf, 0L)))

  test("an unmarked populated dir (pre-versioning vintage) is refused " +
      "loudly by reads AND writes, per family") {
    val spark0 = spark
    import spark0.implicits._
    fams.foreach { f =>
      val state = Files.createTempDirectory(s"graft-fmt-${f.name}")
        .toString + "/state"
      // simulate the old vintage: the probe table exists, no marker
      Seq(1L).toDF("x").write.parquet(s"$state/${f.probe}")
      val e1 = intercept[IllegalArgumentException](f.read(state))
      assert(e1.getMessage.contains("NO layout marker") &&
        e1.getMessage.toLowerCase.contains("rebuild"),
        s"${f.name} read refusal: ${e1.getMessage}")
      val e2 = intercept[IllegalArgumentException](f.write(state))
      assert(e2.getMessage.contains("NO layout marker"),
        s"${f.name} write refusal: ${e2.getMessage}")
    }
  }

  test("a fresh dir stamps v1 at first write and round-trips") {
    fams.foreach { f =>
      val state = Files.createTempDirectory(s"graft-fmtok-${f.name}")
        .toString + "/state"
      f.write(state)
      assert(spark.read.parquet(s"$state/${f.name}_format").collect()
        .map(_.getInt(0)).toSeq == Seq(1),
        s"${f.name} did not stamp v1")
      f.read(state) // the stamped dir serves without complaint
    }
  }
}
