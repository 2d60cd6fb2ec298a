package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Sampling

/** The incremental packing twin: offsets a streaming ingest assigns by
  * extending the persisted ledger must equal the batch q145 computation
  * over all delivered documents — including across a stream restart and
  * a replayed micro-batch. */
class PackingStreamSpec extends SparkSpec {

  private def docsSlice(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001)
      .filter(pred)
      .select(col("doc_id"), col("text"), col("source"))

  test("ordered arrival across restarts reproduces the batch q145 offsets exactly") {
    val root = Files.createTempDirectory("graft-packing").toString
    val docsDir = s"$root/docs"; val stateDir = s"$root/state"
    val ckpt = s"$root/ckpt"

    // wave 1: the low half arrives and is drained
    docsSlice(col("doc_id") < 250).write.parquet(docsDir)
    PackingStream.start(spark, docsDir, stateDir, ckpt,
      availableNow = true).awaitTermination()
    // wave 2: the high half; restart from the same checkpoint
    docsSlice(col("doc_id") >= 250).write.mode("append").parquet(docsDir)
    PackingStream.start(spark, docsDir, stateDir, ckpt,
      availableNow = true).awaitTermination()

    val got = PackingStream.windows(spark, stateDir)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"),
        col("start_window"), col("end_window"), col("n_windows"),
        col("fragmented"))
    val want = Sampling.contextPacking(
      Tables.documents(spark, sf0001), windowTokens = 512, bucketDocs = 64)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "incremental ledger diverged from the batch computation")
  }

  test("replayed micro-batch is a no-op; later batches continue from the high-water mark") {
    val root = Files.createTempDirectory("graft-packing2").toString
    val stateDir = s"$root/state"
    val b1 = docsSlice(col("doc_id") < 100)
    val b2 = docsSlice(col("doc_id") >= 100 && col("doc_id") < 200)

    PackingStream.update(stateDir)(b1, 0L)
    val afterFirst = PackingStream.ledgerState(spark, stateDir).count()
    PackingStream.update(stateDir)(b1, 0L) // replay: crash-after-append path
    assert(PackingStream.ledgerState(spark, stateDir).count() == afterFirst,
      "replay appended duplicate ledger rows")

    PackingStream.update(stateDir)(b2, 1L)
    val led = PackingStream.ledgerState(spark, stateDir)
    // batch 2 starts exactly at batch 1's high-water mark
    val b1End = led.filter(col("batch_id") === 0L)
      .agg(max(col("tok_offset") + col("n_tok"))).collect()(0).getLong(0)
    val b2Start = led.filter(col("batch_id") === 1L)
      .agg(min(col("tok_offset"))).collect()(0).getLong(0)
    assert(b2Start == b1End, s"gap or overlap: b1 ends $b1End, b2 starts $b2Start")
    // the combined ledger is gapless: offsets partition the token stream
    val rows = led.orderBy(col("tok_offset")).collect()
    var expect = 0L
    for (r <- rows) {
      assert(r.getLong(2) == expect, s"offset gap at doc ${r.getLong(0)}")
      expect = r.getLong(2) + r.getLong(1)
    }
  }

  test("crash windows: stale staging is reclaimed; a compacted-away marker still replays to a no-op") {
    val root = Files.createTempDirectory("graft-packing4").toString
    val stateDir = s"$root/state"
    val b1 = docsSlice(col("doc_id") < 60)
    // simulate a crash AFTER staging, BEFORE promote: junk staging dir
    val stage = new java.io.File(s"$stateDir/ledger_stage_000000000")
    stage.mkdirs()
    Files.write(java.nio.file.Paths.get(stage.getPath, "junk.parquet"),
      Array[Byte](1, 2, 3))
    PackingStream.update(stateDir)(b1, 0L)
    assert(!stage.exists(), "staging dir must be reclaimed after promote")
    val n1 = PackingStream.ledgerState(spark, stateDir).count()
    assert(n1 == b1.count())
    // simulate compaction folding the per-batch marker file away, then a
    // replay of the same batch: the doc_id guard must make it a no-op
    val ledgerDir = new java.io.File(s"$stateDir/ledger")
    val marker = ledgerDir.listFiles().find(_.getName.startsWith("batch-")).get
    val renamed = new java.io.File(ledgerDir, "compacted-00000.parquet")
    assert(marker.renameTo(renamed))
    PackingStream.update(stateDir)(b1, 0L) // marker gone, rows present
    assert(PackingStream.ledgerState(spark, stateDir).count() == n1,
      "marker-less replay must not duplicate rows")
    // and the high-water mark still continues correctly afterwards
    PackingStream.update(stateDir)(docsSlice(
      col("doc_id") >= 60 && col("doc_id") < 90), 1L)
    val led = PackingStream.ledgerState(spark, stateDir)
      .orderBy(col("tok_offset")).collect()
    var expect = 0L
    for (r <- led) {
      assert(r.getLong(2) == expect); expect = r.getLong(2) + r.getLong(1)
    }
  }

  test("a dangling compaction .old fails loudly instead of reading as empty state") {
    val root = Files.createTempDirectory("graft-packing5").toString
    val stateDir = s"$root/state"
    PackingStream.update(stateDir)(docsSlice(col("doc_id") < 30), 0L)
    // simulate compactState dying between its two renames
    val dir = new java.io.File(s"$stateDir/ledger")
    assert(dir.renameTo(new java.io.File(s"$stateDir/ledger.old")))
    val e = intercept[IllegalStateException] {
      PackingStream.ledgerState(spark, stateDir).count()
    }
    assert(e.getMessage.contains("crashed between its two renames"))
  }

  test("forget: suffix repack equals the survivors' fresh ledger; replay is a no-op") {
    val root = Files.createTempDirectory("graft-packing-forget").toString
    val stateDir = s"$root/state"
    PackingStream.update(stateDir)(docsSlice(col("doc_id") < 250), 0L)
    PackingStream.update(stateDir)(docsSlice(col("doc_id") >= 250), 1L)

    val tombPred = col("doc_id") % 9 === 4
    val tomb = docsSlice(tombPred).select(col("doc_id"))
    PackingStream.forget(spark, stateDir, tomb)

    // the repacked ledger equals a FRESH pack over exactly the survivors
    // in arrival (doc_id) order — windows, spans, fragmentation and all
    val got = PackingStream.windows(spark, stateDir)
    val want = Sampling.contextPacking(
      Tables.documents(spark, sf0001).filter(!tombPred),
      windowTokens = 512, bucketDocs = 64)
    assert(got.count() == want.count(), "survivor row count")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "repacked ledger diverged from the survivors' fresh pack")
    // the prefix before the first tombstoned offset kept its batch rows;
    // provenance rides through the repack untouched
    assert(PackingStream.ledgerState(spark, stateDir)
      .select(col("batch_id")).distinct().count() == 2,
      "batch provenance lost in the repack")
    // offsets stay gapless after the repack
    val rows = PackingStream.ledgerState(spark, stateDir)
      .orderBy(col("tok_offset")).collect()
    var expect = 0L
    for (r <- rows) {
      assert(r.getLong(2) == expect, s"offset gap at doc ${r.getLong(0)}")
      expect = r.getLong(2) + r.getLong(1)
    }
    // replayed forget: no tombstoned doc remains — a state no-op
    val before = rows.map(_.toString)
    PackingStream.forget(spark, stateDir, tomb)
    val after = PackingStream.ledgerState(spark, stateDir)
      .orderBy(col("tok_offset")).collect().map(_.toString)
    assert(before.sameElements(after), "replayed forget changed the ledger")
    // an empty tombstone set is also a no-op (the early-return path)
    PackingStream.forget(spark, stateDir, tomb.limit(0))
    assert(PackingStream.ledgerState(spark, stateDir).count() == before.length.toLong)
  }

  test("forget preserves the untouched prefix FILES; sequential forgets " +
      "chain; every crash window heals; reads refuse mid-window") {
    import org.apache.hadoop.fs.Path
    val fsConf = spark.sparkContext.hadoopConfiguration
    def build(tag: String): String = {
      val dir = Files.createTempDirectory(s"graft-packfiles-$tag")
        .toString + "/state"
      (0 until 4).foreach(i => PackingStream.update(dir)(
        docsSlice(col("doc_id") >= i * 125 && col("doc_id") < (i + 1) * 125),
        i.toLong))
      dir
    }
    def files(dir: String): Map[String, Long] = {
      val p = new Path(s"$dir/ledger")
      p.getFileSystem(fsConf).listStatus(p)
        .map(st => st.getPath.getName -> st.getLen).toMap
    }
    def rows(dir: String) = PackingStream.ledgerState(spark, dir)
      .orderBy(col("tok_offset")).collect().map(_.toString).toSeq

    // tombstones confined to the LAST arrival quarter — the recent-
    // subject case the write-side bound exists for
    val tombPred = col("doc_id") >= 375 && col("doc_id") % 9 === 4
    val tomb = docsSlice(tombPred).select(col("doc_id"))
    assert(tomb.limit(1).count() > 0, "fixture vacuous")

    val dir = build("main")
    val before = files(dir)
    PackingStream.forget(spark, dir, tomb)
    val after = files(dir)
    // the three prefix files are PHYSICALLY retained, byte-for-byte
    (0 until 3).foreach { i =>
      val n = f"batch-$i%09d.parquet"
      assert(after.get(n) == before.get(n),
        s"prefix file $n was rewritten by a suffix-only deletion")
    }
    assert(!after.contains("batch-000000003.parquet"),
      "the replaced suffix file must be dropped")
    assert(after.contains("forget-000000.parquet"),
      "the repacked suffix file must be promoted under its staged name")
    // and the ledger still equals the survivors' fresh pack
    val want = Sampling.contextPacking(
      Tables.documents(spark, sf0001).filter(!tombPred),
      windowTokens = 512, bucketDocs = 64)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"))
    val led = PackingStream.ledgerState(spark, dir)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"))
    assert(led.exceptAll(want).isEmpty && want.exceptAll(led).isEmpty,
      "file-preserving repack diverged from the survivors' fresh pack")

    // a SECOND forget (tombstones also in the tail) replaces the first
    // pass's forget file under the next sequential name — no collision
    // with the surviving forget-000000
    val tomb2Pred = col("doc_id") >= 375 && col("doc_id") % 9 === 5
    PackingStream.forget(spark, dir,
      docsSlice(tomb2Pred).select(col("doc_id")))
    val after2 = files(dir)
    assert(!after2.contains("forget-000000.parquet") &&
      after2.contains("forget-000001.parquet"),
      s"sequential forget naming broke: ${after2.keys.toSeq.sorted}")
    val led2 = PackingStream.ledgerState(spark, dir)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"))
    val want2 = Sampling.contextPacking(
      Tables.documents(spark, sf0001).filter(!tombPred && !tomb2Pred),
      windowTokens = 512, bucketDocs = 64)
      .select(col("doc_id"), col("n_tok"), col("tok_offset"))
    assert(led2.exceptAll(want2).isEmpty && want2.exceptAll(led2).isEmpty,
      "second sequential forget diverged")

    // crash windows: 1 = staged, 2 = drops done, 3 = repack promoted.
    // Each leaves the pending dir; reads refuse; recovery (or the next
    // forget) heals to the uncrashed result with the prefix intact.
    val ref = build("ref")
    PackingStream.forget(spark, ref, tomb)
    val wantRows = rows(ref)
    Seq(1, 2, 3).foreach { step =>
      val d = build(s"c$step")
      val e = intercept[IllegalStateException] {
        PackingStream.forgetImpl(spark, d, tomb, crashAfterStep = step)
      }
      assert(e.getMessage.contains("injected crash"))
      val r = intercept[IllegalArgumentException] {
        PackingStream.ledgerState(spark, d)
      }
      assert(r.getMessage.contains("ledger_forget_pending"),
        s"window $step: reads must refuse mid-forget")
      val w = intercept[IllegalArgumentException] {
        PackingStream.windows(spark, d)
      }
      assert(w.getMessage.contains("ledger_forget_pending"))
      PackingStream.recoverForget(spark, d)
      assert(rows(d) == wantRows, s"crash window $step did not heal")
      (0 until 3).foreach { i =>
        val n = f"batch-$i%09d.parquet"
        assert(files(d).get(n) == files(ref).get(n),
          s"window $step: prefix file $n not retained through recovery")
      }
    }
  }

  test("at-least-once within one batch: duplicate doc rows assign once") {
    val root = Files.createTempDirectory("graft-packing3").toString
    val stateDir = s"$root/state"
    val b = docsSlice(col("doc_id") < 50)
    PackingStream.update(stateDir)(b.union(b), 0L) // double delivery in-batch
    val led = PackingStream.ledgerState(spark, stateDir)
    assert(led.count() == b.count())
    assert(led.select(col("doc_id")).distinct().count() == b.count())
  }
}
