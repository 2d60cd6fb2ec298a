package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Multimodal

/** The multimodal payload state: persisted digests/signatures must equal
  * a batch recomputation over all delivered assets, and the state-served
  * probes must equal the q133/q134 batch operators restricted to the
  * arrival delta. */
class AssetStateStreamSpec extends SparkSpec {

  private def docsSlice(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001)
      .filter(pred)
      .select(col("doc_id"), col("text"), col("source"))

  /** Full-row slice for the batch twins (Multimodal.assets needs the
    * documents schema incl. n_chars). */
  private def fullSlice(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001).filter(pred)

  test("drain + restart: digest and signature state equal batch recomputation") {
    val root = Files.createTempDirectory("graft-assetstate").toString
    val docsDir = s"$root/docs"; val stateDir = s"$root/state"
    val ckpt = s"$root/ckpt"

    docsSlice(col("doc_id") % 10 < 8).write.parquet(docsDir)
    AssetStateStream.start(spark, docsDir, stateDir, ckpt,
      availableNow = true).awaitTermination()
    docsSlice(col("doc_id") % 10 >= 8).write.mode("append").parquet(docsDir)
    AssetStateStream.start(spark, docsDir, stateDir, ckpt,
      availableNow = true).awaitTermination()

    val all = docsSlice(lit(true))
    val twinDigests = all.select(col("doc_id"),
      Multimodal.mimeOf(col("doc_id")).as("mime"),
      md5(to_binary(col("text"), lit("utf-8"))).as("fp"),
      length(to_binary(col("text"), lit("utf-8"))).cast("bigint").as("n_bytes"))
    val dg = AssetStateStream.digestState(spark, stateDir)
    assert(dg.exceptAll(twinDigests).isEmpty && twinDigests.exceptAll(dg).isEmpty,
      "digest state diverged from batch recomputation")

    val twinSigs = Multimodal.assets(fullSlice(lit(true))).toDF()
      .filter(length(col("blob")) >= 4)
      .select(col("doc_id"),
        graft.expressions.SimHash64(
          graft.expressions.Md5TokenHash64.chunks(col("blob"), 4)).as("sig"))
    val sg = AssetStateStream.sigState(spark, stateDir)
    assert(sg.exceptAll(twinSigs).isEmpty && twinSigs.exceptAll(sg).isEmpty,
      "signature state diverged from batch recomputation")
  }

  test("state-served reclamation report == the batch report over all deliveries") {
    // the q185 contract at spec scale: fold two waves, then the served
    // report must equal payloadDedupReport over a fresh batch digest of
    // everything delivered (the q133 stage — one shared definition)
    val root = Files.createTempDirectory("graft-assetstate-report").toString
    val stateDir = s"$root/state"
    // the sf0.001 texts are all distinct (a report over the raw corpus
    // would be empty == empty, a vacuous pass), so double the corpus
    // with byte-twins shifted by a multiple of 3 — the
    // servedAssetStateDir convention: the doc_id-derived mime agrees,
    // twins share a (mime, fp) group, and the report is provably
    // non-empty
    val base = docsSlice(lit(true))
    val doubled = base.union(base.select(
      (col("doc_id") + 30000L).as("doc_id"), col("text"), col("source")))
    AssetStateStream.update(stateDir)(doubled.filter(col("doc_id") % 2 === 0), 0L)
    AssetStateStream.update(stateDir)(doubled.filter(col("doc_id") % 2 === 1), 1L)
    val twin = Multimodal.payloadDedupReport(doubled.select(
      Multimodal.mimeOf(col("doc_id")).as("mime"),
      md5(to_binary(col("text"), lit("utf-8"))).as("fp"),
      length(to_binary(col("text"), lit("utf-8"))).cast("bigint").as("n_bytes")))
    assert(twin.count() > 0,
      "fixture self-check: the doubled corpus must yield a non-empty report")
    val served = AssetStateStream.payloadDedupFromState(spark, stateDir)
    assert(served.exceptAll(twin).isEmpty && twin.exceptAll(served).isEmpty,
      "state-served reclamation report diverged from the batch report")
  }

  test("forget erases both keyed tables; served report == batch over survivors; replay no-op") {
    val root = Files.createTempDirectory("graft-assetstate-forget").toString
    val stateDir = s"$root/state"
    // the doubled fixture so the post-forget report is non-vacuous AND
    // groups shrink asymmetrically (a tombstoned twin drops its group
    // below the >= 2 cut while the survivor remains a row of state)
    val base = docsSlice(lit(true))
    val doubled = base.union(base.select(
      (col("doc_id") + 30000L).as("doc_id"), col("text"), col("source")))
    AssetStateStream.update(stateDir)(doubled.filter(col("doc_id") % 2 === 0), 0L)
    AssetStateStream.update(stateDir)(doubled.filter(col("doc_id") % 2 === 1), 1L)
    val tombPred = col("doc_id") % 7 === 3
    AssetStateStream.forget(spark, stateDir,
      doubled.select(col("doc_id")).filter(tombPred))
    val dg = AssetStateStream.digestState(spark, stateDir)
    val sg = AssetStateStream.sigState(spark, stateDir)
    assert(dg.filter(tombPred).isEmpty && sg.filter(tombPred).isEmpty,
      "tombstoned rows survived the forget pass")
    assert(dg.count() == doubled.filter(!tombPred).count(),
      "forget disturbed a surviving digest row")
    val survivors = doubled.filter(!tombPred)
    val twin = Multimodal.payloadDedupReport(survivors.select(
      Multimodal.mimeOf(col("doc_id")).as("mime"),
      md5(to_binary(col("text"), lit("utf-8"))).as("fp"),
      length(to_binary(col("text"), lit("utf-8"))).cast("bigint").as("n_bytes")))
    assert(twin.count() > 0,
      "fixture self-check: the post-forget report must stay non-empty")
    val served = AssetStateStream.payloadDedupFromState(spark, stateDir)
    assert(served.exceptAll(twin).isEmpty && twin.exceptAll(served).isEmpty,
      "post-forget served report diverged from the survivors' batch report")
    // re-deleting already-absent keys is a state no-op
    val before = dg.collect().map(_.toString).sorted
    AssetStateStream.forget(spark, stateDir,
      doubled.select(col("doc_id")).filter(tombPred))
    assert(before.sameElements(AssetStateStream.digestState(spark, stateDir)
        .collect().map(_.toString).sorted),
      "replayed forget changed the digest state")
  }

  test("a replayed micro-batch is a state no-op (restart recovery contract)") {
    val root = Files.createTempDirectory("graft-assetstate-replay").toString
    val stateDir = s"$root/state"
    val batch = docsSlice(col("doc_id") < 30)
    AssetStateStream.update(stateDir)(batch, 0L)
    val d1 = AssetStateStream.digestState(spark, stateDir)
      .collect().map(_.toString).sorted
    val s1 = AssetStateStream.sigState(spark, stateDir)
      .collect().map(_.toString).sorted
    AssetStateStream.update(stateDir)(batch, 0L)
    val d2 = AssetStateStream.digestState(spark, stateDir)
      .collect().map(_.toString).sorted
    val s2 = AssetStateStream.sigState(spark, stateDir)
      .collect().map(_.toString).sorted
    assert(d1.sameElements(d2), "replay changed the digest state")
    assert(s1.sameElements(s2), "replay changed the signature state")
  }

  test("exact-dup probe: arrivals re-shipping stored bytes are flagged, fresh ones not") {
    val root = Files.createTempDirectory("graft-assetstate-exact").toString
    val stateDir = s"$root/state"
    AssetStateStream.update(stateDir)(docsSlice(col("doc_id") < 40), 0L)

    // arrivals: 10 re-uploads of stored payloads under NEW asset ids
    // (byte-identical text, the mirror/re-upload shape) + 10 fresh docs
    val reupload = docsSlice(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 600000L)
    val fresh = docsSlice(col("doc_id").between(40, 49))
    val probe = AssetStateStream.exactDupAgainstState(
      stateDir, reupload.unionAll(fresh))
    val byMime = probe.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byMime.values.map(_._1).sum == 20, "20 arrivals probed")
    assert(byMime.values.map(_._2).sum == 10,
      s"exactly the 10 re-uploads must flag as stored dups: $byMime")
    // reclaimable bytes == total payload bytes of the re-uploads
    val reBytes = reupload
      .agg(sum(length(to_binary(col("text"), lit("utf-8"))))).head().getLong(0)
    val recl = probe.agg(sum(col("bytes_reclaimable"))).head().getLong(0)
    assert(recl == reBytes, s"reclaimable $recl != re-upload bytes $reBytes")
  }

  test("near-dup probe from state == batch q134 restricted to the delta") {
    val root = Files.createTempDirectory("graft-assetstate-neardup").toString
    val stateDir = s"$root/state"
    val corpus = docsSlice(col("doc_id") % 10 < 8)
    val arrivals = docsSlice(col("doc_id") % 10 >= 8)
    AssetStateStream.update(stateDir)(corpus, 0L)

    val served = AssetStateStream.nearDupAgainstState(stateDir, arrivals,
      maxHamming = 8)
    // the batch q134 operator over the full (state + arrivals) corpus,
    // restricted to pairs touching at least one arrival
    val arrIds = arrivals.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val batch = Multimodal.payloadSimhashPairs(
        Multimodal.assets(fullSlice(lit(true))).toDF(), maxHamming = 8)
      .filter(col("d1").isin(arrIds.toSeq: _*) ||
        col("d2").isin(arrIds.toSeq: _*))
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty,
      "state-served payload near-dup diverged from batch q134 on the delta")
    // and it emits NO old×old pairs
    val oldOld = served.filter(!col("d1").isin(arrIds.toSeq: _*) &&
      !col("d2").isin(arrIds.toSeq: _*))
    assert(oldOld.isEmpty, "probe recomputed the old×old quadrant")
  }

  test("every forget crash window refuses reads, then heals (staged " +
      "pending): no window can serve forgotten digests next to " +
      "unforgotten signatures") {
    val docs = docsSlice(col("doc_id") < 120)
    val tombPred = graft.operators.Sampling.tombstoned(col("doc_id"))
    val tomb = docs.select(col("doc_id")).filter(tombPred)
    assert(tomb.limit(1).count() > 0, "fixture vacuous")
    val fresh = Files.createTempDirectory("graft-assetcrash-want").toString
    AssetStateStream.update(s"$fresh/state")(docs.filter(!tombPred), 0L)
    val wantDig = AssetStateStream.digestState(spark, s"$fresh/state")
    val wantSig = AssetStateStream.sigState(spark, s"$fresh/state")
    (0 to 2).foreach { step =>
      val root = Files.createTempDirectory(s"graft-assetcrash$step").toString
      val state = s"$root/state"
      AssetStateStream.update(state)(docs, 0L)
      intercept[IllegalStateException] {
        AssetStateStream.forgetImpl(spark, state, tomb, crashAfterSwap = step)
      }
      val e = intercept[IllegalArgumentException] {
        AssetStateStream.digestState(spark, state)
      }
      assert(e.getMessage.contains("forget_pending"), e.getMessage)
      intercept[IllegalArgumentException] {
        AssetStateStream.sigState(spark, state)
      }
      intercept[IllegalArgumentException] { // mid-window append refuses too
        AssetStateStream.update(state)(docs.limit(1), 9L)
      }
      AssetStateStream.recoverForget(spark, state)
      val dig = AssetStateStream.digestState(spark, state)
      val sig = AssetStateStream.sigState(spark, state)
      assert(dig.exceptAll(wantDig).isEmpty && wantDig.exceptAll(dig).isEmpty,
        s"step $step healed digests diverged from the survivors'")
      assert(sig.exceptAll(wantSig).isEmpty && wantSig.exceptAll(sig).isEmpty,
        s"step $step healed signatures diverged from the survivors'")
    }
  }
}
