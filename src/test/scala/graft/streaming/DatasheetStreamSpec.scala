package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** The incrementally maintained datasheet: the state-served q156 table
  * must equal the batch `datasetDatasheet` over all delivered documents,
  * across multiple batches, a replayed batch, and a crash window between
  * a delta append and its ledger row. */
class DatasheetStreamSpec extends SparkSpec {

  private def docsSlice(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001)
      .filter(pred)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

  private def collectSheet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq

  test("state-served datasheet == batch q156 over all delivered docs") {
    val root = Files.createTempDirectory("graft-dsstate").toString
    val state = s"$root/state"
    val b1 = docsSlice(col("doc_id") % 3 === 0)
    val b2 = docsSlice(col("doc_id") % 3 === 1)
    val b3 = docsSlice(col("doc_id") % 3 === 2)
    DatasheetStateStream.update(state)(b1, 0L)
    DatasheetStateStream.update(state)(b2, 1L)
    // mid-stream read must already be exact over what has arrived
    val mid = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val midBatch = collectSheet(
      Dedup.datasetDatasheet(docsSlice(col("doc_id") % 3 < 2)))
    assert(mid == midBatch, s"mid-stream sheet diverged:\n$mid\nvs\n$midBatch")
    DatasheetStateStream.update(state)(b3, 2L)
    val fin = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val finBatch = collectSheet(Dedup.datasetDatasheet(docsSlice(lit(true))))
    assert(fin == finBatch, s"final sheet diverged:\n$fin\nvs\n$finBatch")
    // and the sheet is non-trivial on this fixture
    val m = fin.toMap
    assert(m("n_docs") > 0 && m("n_tokens") > 0 && m("vocab_size") > 0)
  }

  test("replayed batch is a no-op: every table, counter, and metric unchanged") {
    val root = Files.createTempDirectory("graft-dsreplay").toString
    val state = s"$root/state"
    val b1 = docsSlice(col("doc_id") % 2 === 0)
    DatasheetStateStream.update(state)(b1, 0L)
    val before = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    DatasheetStateStream.update(state)(b1, 0L) // crash-and-replay delivery
    val after = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    assert(before == after, "replay changed the datasheet")
    assert(before == collectSheet(Dedup.datasetDatasheet(b1)))
  }

  test("foldDeltas: counters fold to one snapshot row, the datasheet is unchanged") {
    val root = Files.createTempDirectory("graft-dsfold").toString
    val state = s"$root/state"
    (0 until 3).foreach(i => DatasheetStateStream.update(state)(
      docsSlice(col("doc_id") % 3 === i), i.toLong))
    val pre = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val ((cb, ca), (pb, pa)) = DatasheetStateStream.foldDeltas(spark, state)
    assert(cb == 3 && ca == 1, s"three per-batch counter rows must fold to one ($cb -> $ca)")
    assert(pa <= pb, s"prefix fold grew the table ($pb -> $pa)")
    val post = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    assert(pre == post, "fold changed the served datasheet")
    // and the folded state still equals the batch ground truth
    assert(post == collectSheet(Dedup.datasetDatasheet(docsSlice(lit(true)))))
  }

  test("fold mid-read-session is value-neutral: interleaved reads all equal, re-fold is a row no-op") {
    // The serving contract behind q181/q184/q186: a read SESSION holds no
    // frame across a fold (each read constructs fresh over the swapped-in
    // files — folds run from quiet windows, per the compactState scaladoc),
    // and under that contract NO interleaving of reads and folds can change
    // a served value. Pinned explicitly: read, fold, read, fold-again (no
    // new data — must be a row-count no-op), read: all three reads equal
    // each other and the batch ground truth.
    val root = Files.createTempDirectory("graft-dsfoldmid").toString
    val state = s"$root/state"
    (0 until 3).foreach(i => DatasheetStateStream.update(state)(
      docsSlice(col("doc_id") % 3 === i), i.toLong))
    val r1 = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    DatasheetStateStream.foldDeltas(spark, state)
    val r2 = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val ((cb2, ca2), (pb2, pa2)) = DatasheetStateStream.foldDeltas(spark, state)
    val r3 = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    assert(r1 == r2, "first fold changed a served value between read sessions")
    assert(r2 == r3, "idempotent re-fold changed a served value")
    assert(cb2 == ca2 && pb2 == pa2,
      s"re-fold without new deltas must not change row counts " +
        s"(counters $cb2 -> $ca2, prefixes $pb2 -> $pa2)")
    assert(r3 == collectSheet(Dedup.datasetDatasheet(docsSlice(lit(true)))),
      "post-fold sheet diverged from batch recompute")
  }

  test("crash window heals: deltas present without ledger never double-count") {
    val root = Files.createTempDirectory("graft-dscrash").toString
    val state = s"$root/state"
    val b1 = docsSlice(col("doc_id") % 2 === 0)
    DatasheetStateStream.update(state)(b1, 0L)
    // simulate a crash AFTER batch 1's counter append, BEFORE its ledger
    // row: run the counter/prefix appends by hand with batch_id 1...
    val b2 = docsSlice(col("doc_id") % 2 === 1)
    import graft.operators.TextAnalysis
    TextAnalysis.gateFlags(b2)
      .select(col("nt"), (col("f_short") || col("f_low_ttr") ||
        col("f_bad_len") || col("f_dup")).as("f"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(when(col("f"), 1L).otherwise(0L)).as("n_flagged"))
      .select(lit(1L).as("batch_id"), col("n_docs"), col("n_tokens"),
        col("n_flagged"))
      .write.mode("append").parquet(s"$state/ds_counters")
    // ...then deliver batch 1 through the normal path: the ledger probe
    // misses, the delta-log probe hits, nothing re-appends
    DatasheetStateStream.update(state)(b2, 1L)
    val sheet = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val batch = collectSheet(Dedup.datasetDatasheet(docsSlice(lit(true))))
    assert(sheet == batch, "crash-window replay double-counted a delta")
  }

  test("streamed drain + restart through the file source matches batch") {
    val root = Files.createTempDirectory("graft-dsdrain").toString
    val docsDir = s"$root/docs"; val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    docsSlice(col("doc_id") % 10 < 7).write.parquet(docsDir)
    DatasheetStateStream.start(spark, docsDir, state, ckpt,
      availableNow = true).awaitTermination()
    docsSlice(col("doc_id") % 10 >= 7).write.mode("append").parquet(docsDir)
    DatasheetStateStream.start(spark, docsDir, state, ckpt,
      availableNow = true).awaitTermination()
    val sheet = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val batch = collectSheet(Dedup.datasetDatasheet(docsSlice(lit(true))))
    assert(sheet == batch, "post-restart sheet diverged from batch recompute")
  }

  test("in-stream foldEvery: drain + restart with mid-stream folds still matches batch") {
    val root = Files.createTempDirectory("graft-dsdrainfold").toString
    val docsDir = s"$root/docs"; val state = s"$root/state"
    val ckpt = s"$root/ckpt"
    // 4 files, one per trigger: folds fire after batches 2 and 4; the
    // restart drain continues the SAME batch-id sequence, so the next
    // fold lands on schedule after batch 6
    docsSlice(col("doc_id") % 10 < 7).repartition(4).write.parquet(docsDir)
    DatasheetStateStream.start(spark, docsDir, state, ckpt,
      availableNow = true, maxFilesPerTrigger = Some(1),
      foldEvery = Some(2)).awaitTermination()
    docsSlice(col("doc_id") % 10 >= 7).repartition(2)
      .write.mode("append").parquet(docsDir)
    DatasheetStateStream.start(spark, docsDir, state, ckpt,
      availableNow = true, maxFilesPerTrigger = Some(1),
      foldEvery = Some(2)).awaitTermination()
    val sheet = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val batch = collectSheet(Dedup.datasetDatasheet(docsSlice(lit(true))))
    assert(sheet == batch, "mid-stream folds perturbed the datasheet")
    // last fold ran at batch 6 (the final one): counters are snapshotted
    assert(spark.read.parquet(s"$state/ds_counters").count() == 1,
      "counters not snapshotted by the in-stream fold")
  }

  test("forget: sheet equals batch over survivors; a key whose every holder died leaves") {
    val root = Files.createTempDirectory("graft-dsforget").toString
    val state = s"$root/state"
    import spark.implicits._
    // synthetic fixture: lang "xx" and word "zzqq" exist ONLY in the
    // tombstoned docs, so the forget must retire them from n_langs and
    // vocab_size (the un-assertion the r14 set layout could not do)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3, "en", "web"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3, "en", "web"),
      (3L, "zzqq wwkk yyjj xxhh vvgg uuff ttee ssdd rrcc qqbb " * 3, "xx", "crawl"),
      (4L, "alpha zzqq beta wwkk gamma yyjj delta xxhh epsilon vvgg " * 3, "xx", "web")
    ).toDF("doc_id", "text", "lang", "source")
    DatasheetStateStream.update(state)(docs.filter(col("doc_id") <= 2), 0L)
    DatasheetStateStream.update(state)(docs.filter(col("doc_id") > 2), 1L)

    val tomb = docs.filter(col("doc_id") >= 3)
    DatasheetStateStream.forget(state)(tomb, 2L)
    val got = collectSheet(DatasheetStateStream.datasheetFromState(spark, state))
    val want = collectSheet(Dedup.datasetDatasheet(docs.filter(col("doc_id") < 3)))
    assert(got == want, s"forgotten sheet diverged from survivors' batch:\n$got\nvs\n$want")
    val m = got.toMap
    assert(m("n_langs") == 1.0 && m("n_sources") == 1.0,
      "a lang/source whose every holder died must leave the sheet")
    // the retired word is gone from the vocabulary count
    assert(m("vocab_size") == 10.0, s"vocab must shrink to the survivors' 10 words: $m")
    // sigs swapped to survivors: the near-dup metric reads 2 members
    assert(CorpusStateStream.sigState(spark, state).count() == 2)

    // replay with the same batchId: ledger no-op, identical sheet
    DatasheetStateStream.forget(state)(tomb, 2L)
    assert(collectSheet(DatasheetStateStream.datasheetFromState(spark, state)) == got,
      "replayed forget changed the sheet")
    // fold across the negative batch is value-neutral
    DatasheetStateStream.foldDeltas(spark, state)
    assert(collectSheet(DatasheetStateStream.datasheetFromState(spark, state)) == got,
      "fold across a negative batch changed the sheet")
  }

  test("a forget reusing an arrival's batchId fails fast, and vice versa " +
      "(the sign guard); a fresh-id forget still replays clean") {
    val root = Files.createTempDirectory("graft-dssign").toString
    val state = s"$root/state"
    val arrivals = docsSlice(col("doc_id") % 3 === 0)
    DatasheetStateStream.update(state)(arrivals, 0L)
    val tomb = docsSlice(col("doc_id") % 3 === 0)
      .filter(graft.operators.Sampling.tombstoned(col("doc_id")))
    assert(tomb.limit(1).count() > 0, "fixture vacuous")
    val before = collectSheet(
      DatasheetStateStream.datasheetFromState(spark, state))
    // forget under the ARRIVAL's ledger id: the r15 code silently
    // skipped the negative deltas as a "replay" yet still swapped the
    // sigs — counters inconsistent with the signature table. Now: a
    // hard error BEFORE any table is touched.
    val e = intercept[IllegalArgumentException] {
      DatasheetStateStream.forget(state)(tomb, 0L)
    }
    assert(e.getMessage.contains("ARRIVAL") &&
      e.getMessage.contains("fresh batchId"), e.getMessage)
    assert(collectSheet(
        DatasheetStateStream.datasheetFromState(spark, state)) == before,
      "a refused forget must leave every table untouched")
    assert(CorpusStateStream.sigState(spark, state).count() ==
      arrivals.count(), "a refused forget must not swap the sigs")
    // the reverse direction: an arrival reusing a committed forget's id
    DatasheetStateStream.forget(state)(tomb, 1L)
    val afterForget = collectSheet(
      DatasheetStateStream.datasheetFromState(spark, state))
    val e2 = intercept[IllegalArgumentException] {
      DatasheetStateStream.update(state)(arrivals, 1L)
    }
    assert(e2.getMessage.contains("FORGET"), e2.getMessage)
    // a genuine same-id forget replay stays the documented no-op
    DatasheetStateStream.forget(state)(tomb, 1L)
    assert(collectSheet(
        DatasheetStateStream.datasheetFromState(spark, state)) == afterForget,
      "replayed forget changed the sheet")
  }

  test("forget crash windows: reads refuse mid-window; a committed-" +
      "delta window completes from stored tombstones; a pre-delta " +
      "window names its batch and only its owner heals it") {
    val all = docsSlice(col("doc_id") < 150)
    val tombPred = graft.operators.Sampling.tombstoned(col("doc_id"))
    val tombDocs = all.filter(tombPred).localCheckpoint()
    assert(tombDocs.limit(1).count() > 0, "fixture vacuous")
    val wantSheet = collectSheet(
      graft.operators.Dedup.datasetDatasheet(all.filter(!tombPred)))
    // step 1: deltas + ledger committed, the sigs swap lost — the
    // window that previously served counters without the deleted docs
    // next to near-dup pairs still counting them
    val s1 = Files.createTempDirectory("graft-dscrash1").toString + "/state"
    DatasheetStateStream.update(s1)(all, 0L)
    intercept[IllegalStateException] {
      DatasheetStateStream.forgetImpl(s1, tombDocs, 1L, crashAfterStep = 1)
    }
    val e1 = intercept[IllegalArgumentException] {
      DatasheetStateStream.datasheetFromState(spark, s1)
    }
    assert(e1.getMessage.contains("forget_pending"), e1.getMessage)
    intercept[IllegalArgumentException] {
      DatasheetStateStream.vocabularyState(spark, s1)
    }
    intercept[IllegalArgumentException] { // mid-window append refuses
      DatasheetStateStream.update(s1)(all.limit(1), 9L)
    }
    DatasheetStateStream.recoverForget(spark, s1) // completes the swap
    assert(collectSheet(DatasheetStateStream.datasheetFromState(spark, s1))
      == wantSheet, "healed sheet diverged from the survivors' batch")
    // step 0: staged only (crash BEFORE the deltas) — recovery cannot
    // rebuild deltas from ids alone: it refuses naming the batch, a
    // DIFFERENT deletion refuses too, and the owner's replay heals
    val s0 = Files.createTempDirectory("graft-dscrash0").toString + "/state"
    DatasheetStateStream.update(s0)(all, 0L)
    intercept[IllegalStateException] {
      DatasheetStateStream.forgetImpl(s0, tombDocs, 1L, crashAfterStep = 0)
    }
    intercept[IllegalArgumentException] {
      DatasheetStateStream.datasheetFromState(spark, s0)
    }
    val e0 = intercept[IllegalStateException] {
      DatasheetStateStream.recoverForget(spark, s0)
    }
    assert(e0.getMessage.contains("batch 1"), e0.getMessage)
    val eOther = intercept[IllegalStateException] {
      DatasheetStateStream.forget(s0)(all.filter(col("doc_id") === 2L), 5L)
    }
    assert(eOther.getMessage.contains("batch 1"), eOther.getMessage)
    DatasheetStateStream.forget(s0)(tombDocs, 1L) // the owner heals
    assert(collectSheet(DatasheetStateStream.datasheetFromState(spark, s0))
      == wantSheet, "owner-healed sheet diverged from the survivors' batch")
  }

  test("a populated pre-versioning state dir is refused loudly by " +
      "writes and reads; a wrong-version marker names both versions") {
    val root = Files.createTempDirectory("graft-dsformat").toString
    val state = s"$root/state"
    // simulate an old checkpoint: the ledger exists, no layout marker
    // (every vintage of the layout wrote the ledger, so it dates the
    // state; the r14 set-table rows would otherwise read as zero-delta
    // garbage under the df schema)
    spark.range(1).select(col("id").as("batch_id"))
      .write.parquet(s"$state/ds_ledger")
    val docs = docsSlice(col("doc_id") % 7 === 0)
    val e1 = intercept[IllegalArgumentException] {
      DatasheetStateStream.update(state)(docs, 5L)
    }
    assert(e1.getMessage.contains("NO layout marker"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DatasheetStateStream.datasheetFromState(spark, state)
    }
    assert(e2.getMessage.contains("NO layout marker"))
    val e3 = intercept[IllegalArgumentException] {
      DatasheetStateStream.vocabularyState(spark, state)
    }
    assert(e3.getMessage.contains("NO layout marker"))
    // a marker from a FUTURE (or past) layout names both versions
    spark.range(1).select(lit(7).as("version"))
      .write.mode("overwrite").parquet(s"$state/ds_format")
    val e4 = intercept[IllegalArgumentException] {
      DatasheetStateStream.update(state)(docs, 5L)
    }
    assert(e4.getMessage.contains("layout v7") &&
      e4.getMessage.contains("v2"), e4.getMessage)
    // a FRESH dir stamps itself and round-trips
    val fresh = s"$root/fresh"
    DatasheetStateStream.update(fresh)(docs, 0L)
    assert(spark.read.parquet(s"$fresh/ds_format").collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    assert(collectSheet(DatasheetStateStream.datasheetFromState(spark, fresh))
      == collectSheet(Dedup.datasetDatasheet(docs)))
  }
}
