package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Incremental centroid state: additive integer micro-unit sums make the
  * state-served q108 drift matrix EXACTLY the batch recompute, and the
  * arrival-drift read is the crawl-over-crawl alarm. */
class CentroidStreamSpec extends SparkSpec {

  private def srcVecs(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001).select(col("doc_id"), col("source"))
      .join(Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .filter(pred)
      .select(col("vec_id"), col("embedding"), col("source"))

  // sorted by key — the driver's own sorted-rows canonicalization: row
  // ORDER is presentation only (registered queries stopped carrying a
  // final Sort in r17), the matrix VALUES are the equality under test
  private def collectMatrix(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toSeq.sortBy(_._1)

  test("state-served drift matrix == the registered q108 over all deliveries") {
    val root = Files.createTempDirectory("graft-centstate").toString
    val state = s"$root/state"
    CentroidStateStream.update(state)(srcVecs(col("vec_id") % 2 === 0), 0L)
    CentroidStateStream.update(state)(srcVecs(col("vec_id") % 2 === 1), 1L)
    val served = collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, state))
    // the REGISTERED oracle-checked query is the ground truth — the
    // stream must reproduce the exact hash-checked artifact
    val batch = collectMatrix(
      graft.SparkEntry.queries("q108_centroid_drift")(spark, sf0001))
    assert(served == batch,
      s"state-served matrix diverged from q108:\n$served\nvs\n$batch")
  }

  test("replayed batch is a no-op; split points don't matter (additivity)") {
    val rootA = Files.createTempDirectory("graft-centA").toString
    val rootB = Files.createTempDirectory("graft-centB").toString
    // A: two batches split by parity, batch 0 replayed once
    CentroidStateStream.update(s"$rootA/s")(srcVecs(col("vec_id") % 2 === 0), 0L)
    CentroidStateStream.update(s"$rootA/s")(srcVecs(col("vec_id") % 2 === 0), 0L)
    CentroidStateStream.update(s"$rootA/s")(srcVecs(col("vec_id") % 2 === 1), 1L)
    // B: three batches split by mod 3
    (0 until 3).foreach(i => CentroidStateStream.update(s"$rootB/s")(
      srcVecs(col("vec_id") % 3 === i), i.toLong))
    val a = collectMatrix(CentroidStateStream.driftMatrixFromState(spark, s"$rootA/s"))
    val b = collectMatrix(CentroidStateStream.driftMatrixFromState(spark, s"$rootB/s"))
    assert(a == b, "matrix must be independent of delivery batching and replay")
  }

  test("foldDeltas bounds state to |sources|·64 rows; the drift matrix is bit-unchanged") {
    val root = Files.createTempDirectory("graft-centfold").toString
    val state = s"$root/state"
    (0 until 3).foreach(i => CentroidStateStream.update(state)(
      srcVecs(col("vec_id") % 3 === i), i.toLong))
    val pre = collectMatrix(CentroidStateStream.driftMatrixFromState(spark, state))
    val nKeys = spark.read.parquet(s"$state/cent")
      .select(col("source"), col("dim")).distinct().count()
    val (before, after) = CentroidStateStream.foldDeltas(spark, state)
    assert(before > nKeys, s"fixture vacuous: $before delta rows for $nKeys keys")
    assert(after == nKeys, s"fold must leave one row per (source, dim), got $after")
    // integer sums: the served matrix is IDENTICAL, not approximately so
    val post = collectMatrix(CentroidStateStream.driftMatrixFromState(spark, state))
    assert(pre == post, "fold changed the served drift matrix")
    // a replayed folded batch still short-circuits on the ledger
    CentroidStateStream.update(state)(srcVecs(col("vec_id") % 3 === 0), 0L)
    assert(pre == collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, state)),
      "replay after fold double-counted")
  }

  test("arrival drift: same distribution ≈ 1, negated vectors ≈ -1, no history = null") {
    val root = Files.createTempDirectory("graft-centdrift").toString
    val state = s"$root/state"
    val hist = srcVecs(lit(true))
    CentroidStateStream.update(state)(hist, 0L)
    // the SAME vectors arriving again: drift ≈ 1 (exact up to sqrt(x)*sqrt(x) ulp)
    val same = CentroidStateStream.arrivalDriftAgainstState(state, hist)
      .collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getBoolean(1), s"${r.getString(0)} lost its history")
      assert(r.getDouble(2) > 0.999999, s"${r.getString(0)}: ${r.getDouble(2)}")
    }
    // negated vectors: drift ≈ -1 (floor asymmetry on negatives keeps it
    // from exactly -1) — the alarm fires hard on a flipped distribution
    val negated = hist.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"), col("source"))
    val neg = CentroidStateStream.arrivalDriftAgainstState(state, negated)
      .collect()
    neg.foreach(r => assert(r.getDouble(2) < -0.99,
      s"${r.getString(0)}: ${r.getDouble(2)}"))
    // an unseen source surfaces with null cosine, not a dropped row
    val novel = hist.limit(5)
      .select(col("vec_id"), col("embedding"), lit("brand_new_src").as("source"))
    val nv = CentroidStateStream.arrivalDriftAgainstState(state, novel)
      .collect()
    assert(nv.length == 1 && !nv.head.getBoolean(1) && nv.head.isNullAt(2),
      "unseen source must surface with has_history=false and null cosine")
  }

  test("forget nets to the survivors' fresh state; replay no-op; zeroed source exits") {
    val root = Files.createTempDirectory("graft-centforget").toString
    val state = s"$root/forgotten"
    val all = srcVecs(lit(true))
    CentroidStateStream.update(state)(all.filter(col("vec_id") % 2 === 0), 0L)
    CentroidStateStream.update(state)(all.filter(col("vec_id") % 2 === 1), 1L)
    val tomb = all.filter(graft.operators.Sampling.tombstoned(col("vec_id")))
    assert(tomb.limit(1).count() > 0, "fixture vacuous: no tombstoned vectors")
    CentroidStateStream.forget(state)(tomb, 2L)
    // replayed forget: the ledger probe must drop the duplicate batch
    CentroidStateStream.forget(state)(tomb, 2L)
    val forgotten = collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, state))
    // ground truth: a FRESH state folded from only the survivors — the
    // exact-integer design makes this an identity, not an epsilon claim
    val fresh = s"$root/fresh"
    CentroidStateStream.update(fresh)(
      all.filter(!graft.operators.Sampling.tombstoned(col("vec_id"))), 0L)
    val want = collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, fresh))
    assert(forgotten == want,
      s"forgotten state diverged from the survivors' fresh state:\n" +
      s"$forgotten\nvs\n$want")
    // fold the mixed-sign log: the matrix must be bit-unchanged
    CentroidStateStream.foldDeltas(spark, state)
    assert(forgotten == collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, state)),
      "folding the mixed-sign log changed the forgotten matrix")
    // a source whose EVERY vector is forgotten nets n = 0 per key and
    // must leave the served sums through the n > 0 cut (its mean would
    // otherwise divide by zero), while other sources are untouched
    val lone = s"$root/lone"
    val firstSrc = all.select(col("source")).orderBy(col("source"))
      .limit(1).collect().head.getString(0)
    val victims = all.filter(col("source") === firstSrc)
    CentroidStateStream.update(lone)(all, 0L)
    CentroidStateStream.forget(lone)(victims, 1L)
    val sums = CentroidStateStream.centroidSumsState(spark, lone)
    assert(sums.filter(col("source") === firstSrc).count() == 0,
      "a fully-forgotten source must exit the served sums")
    val others = collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, lone))
    assert(others.nonEmpty && others.forall {
      case ((s1, s2), _) => s1 != firstSrc && s2 != firstSrc },
      "the forgotten source leaked into the served matrix")
  }

  test("streamed drain through the file source matches the direct updates") {
    val root = Files.createTempDirectory("graft-centdrain").toString
    val vecsDir = s"$root/vecs"; val state = s"$root/state"
    srcVecs(lit(true)).write.parquet(vecsDir)
    CentroidStateStream.start(spark, vecsDir, state, s"$root/ckpt",
      availableNow = true).awaitTermination()
    val served = collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, state))
    val batch = collectMatrix(
      graft.SparkEntry.queries("q108_centroid_drift")(spark, sf0001))
    assert(served == batch)
  }

  test("in-stream foldEvery: a multi-batch drain keeps the log bounded and the matrix exact") {
    val root = Files.createTempDirectory("graft-centdrainfold").toString
    val vecsDir = s"$root/vecs"; val state = s"$root/state"
    // 6 input files at one file per trigger → 6 micro-batches, folds
    // fire from inside the stream after batches 2, 4, and 6
    srcVecs(lit(true)).repartition(6).write.parquet(vecsDir)
    CentroidStateStream.start(spark, vecsDir, state, s"$root/ckpt",
      availableNow = true, maxFilesPerTrigger = Some(1),
      foldEvery = Some(2)).awaitTermination()
    val served = collectMatrix(
      CentroidStateStream.driftMatrixFromState(spark, state))
    val batch = collectMatrix(
      graft.SparkEntry.queries("q108_centroid_drift")(spark, sf0001))
    assert(served == batch, "in-stream folds perturbed the drift matrix")
    // the last fold ran at batch 6, so the log holds exactly the
    // per-key snapshot — 6 batches of deltas folded away mid-stream
    val nKeys = spark.read.parquet(s"$state/cent")
      .select(col("source"), col("dim")).distinct().count()
    assert(spark.read.parquet(s"$state/cent").count() == nKeys,
      "delta log not bounded after the in-stream fold")
    // the fold window also compacts the ledger's FILES (rows persist
    // for replay probes): after the batch-6 fold the probe reads one
    // file, not one per batch
    val ledgerFiles = new java.io.File(s"$state/cent_ledger")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(ledgerFiles == 1,
      s"ledger holds $ledgerFiles parquet files after the in-stream fold")
    assert(spark.read.parquet(s"$state/cent_ledger").count() == 6,
      "ledger rows must survive the file compaction")
  }
}
