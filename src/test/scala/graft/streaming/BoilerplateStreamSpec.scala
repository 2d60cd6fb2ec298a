package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The incrementally maintained boilerplate blacklist: the state-served
  * q106 phrase table must equal the batch recompute over all delivered
  * documents — across batches, a replayed batch, a crash window between
  * a delta append and its ledger row, and a fold. */
class BoilerplateStreamSpec extends SparkSpec {

  private def docsSlice(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001)
      .filter(pred)
      .select(col("doc_id"), col("text"), col("source"))

  /** The q106 batch operator over an arbitrary corpus slice. */
  private def batchTable(docs: org.apache.spark.sql.DataFrame) = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(
        explode(graft.expressions.ShingleText(col("text"), 3)).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .crossJoin(broadcast(nDocs))
      .select(col("phrase"), col("df"),
        (col("df").cast("double") / col("n_docs").cast("double")).as("df_share"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("df").desc, col("phrase"))
      .collect().map(_.toString).toSeq

  test("state-served blacklist == batch q106 across batches, replay, crash window") {
    val root = Files.createTempDirectory("graft-bpstate").toString
    val state = s"$root/state"
    val b1 = docsSlice(col("doc_id") % 3 === 0)
    val b2 = docsSlice(col("doc_id") % 3 === 1)
    val b3 = docsSlice(col("doc_id") % 3 === 2)
    BoilerplateStateStream.update(state)(b1, 0L)
    // mid-stream read must already be exact over what has arrived
    assert(rows(BoilerplateStateStream.phraseTableFromState(spark, state)) ==
      rows(batchTable(docsSlice(col("doc_id") % 3 === 0))),
      "mid-stream blacklist diverged from batch")
    BoilerplateStateStream.update(state)(b2, 1L)
    BoilerplateStateStream.update(state)(b2, 1L) // crash-and-replay delivery
    // crash window: batch 2's phrase deltas land but its ledger row is
    // lost — the normal-path replay must heal without double-counting
    b3.select(explode(graft.expressions.ShingleText(col("text"), 3)).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("delta"))
      .select(lit(2L).as("batch_id"), col("phrase"), col("delta"))
      .write.mode("append").parquet(s"$state/bp_phrases")
    BoilerplateStateStream.update(state)(b3, 2L)
    val served = rows(BoilerplateStateStream.phraseTableFromState(spark, state))
    assert(served == rows(batchTable(docsSlice(lit(true)))),
      "final blacklist diverged from batch (replay or crash window double-counted)")
    assert(served.nonEmpty, "fixture produced an empty blacklist")
  }

  test("fold is value-neutral and bounds the delta log; drain with foldEvery matches batch") {
    val root = Files.createTempDirectory("graft-bpfold").toString
    val state = s"$root/state"
    (0 until 3).foreach(i => BoilerplateStateStream.update(state)(
      docsSlice(col("doc_id") % 3 === i), i.toLong))
    val pre = rows(BoilerplateStateStream.phraseTableFromState(spark, state))
    val ((pb, pa), (cb, ca)) = BoilerplateStateStream.foldDeltas(spark, state)
    assert(ca == 1, s"three counter rows must fold to one ($cb -> $ca)")
    assert(pa <= pb, s"phrase fold grew the table ($pb -> $pa)")
    assert(pre == rows(BoilerplateStateStream.phraseTableFromState(spark, state)),
      "fold changed the served blacklist")
    // streamed drain through the file source with in-stream folds
    val root2 = Files.createTempDirectory("graft-bpdrain").toString
    val docsDir = s"$root2/docs"; val state2 = s"$root2/state"
    docsSlice(lit(true)).repartition(4).write.parquet(docsDir)
    BoilerplateStateStream.start(spark, docsDir, state2, s"$root2/ckpt",
      availableNow = true, maxFilesPerTrigger = Some(1),
      foldEvery = Some(2)).awaitTermination()
    assert(rows(BoilerplateStateStream.phraseTableFromState(spark, state2)) ==
      rows(batchTable(docsSlice(lit(true)))),
      "drained blacklist with mid-stream folds diverged from batch")
  }

  test("forget nets out the deleted docs; replay is a no-op; zero rows never serve") {
    val root = Files.createTempDirectory("graft-bpforget").toString
    val state = s"$root/state"
    val tombPred = col("doc_id") % 5 === 2
    BoilerplateStateStream.update(state)(docsSlice(col("doc_id") % 2 === 0), 0L)
    BoilerplateStateStream.update(state)(docsSlice(col("doc_id") % 2 =!= 0), 1L)
    // the deletion request carries its own documents (id-pushdown read)
    BoilerplateStateStream.forget(state)(docsSlice(tombPred), 2L)
    val served = rows(BoilerplateStateStream.phraseTableFromState(spark, state))
    assert(served == rows(batchTable(docsSlice(!tombPred))),
      "post-forget blacklist diverged from the survivors' batch recompute")
    assert(served.nonEmpty, "fixture produced an empty post-forget blacklist")
    // a replayed forget (same batch id) is a ledger no-op
    BoilerplateStateStream.forget(state)(docsSlice(tombPred), 2L)
    assert(served == rows(BoilerplateStateStream.phraseTableFromState(spark, state)),
      "replayed forget double-subtracted")
    // fold nets deletion against accumulation without changing the read;
    // net-zero phrases persist as snapshot residue but can never serve
    BoilerplateStateStream.foldDeltas(spark, state)
    assert(served == rows(BoilerplateStateStream.phraseTableFromState(spark, state)),
      "fold over mixed-sign deltas changed the served blacklist")
    val snap = CorpusStateStream.stateDf(spark, s"$state/bp_phrases",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("phrase",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("delta",
          org.apache.spark.sql.types.LongType))))
    assert(snap.filter(col("delta") < 0).isEmpty,
      "net df went negative: forget subtracted a doc that was never counted")
  }

  test("pre-versioning blacklist state is refused loudly; a forget " +
      "reusing an arrival batchId fails fast") {
    val root = Files.createTempDirectory("graft-bpformat").toString
    val state = s"$root/state"
    // simulate a pre-r14 checkpoint: ledger present, no layout marker —
    // its deltas were counted under the old within-trigger convention,
    // so replaying into it would drift from BOTH conventions
    spark.range(1).select(col("id").as("batch_id"))
      .write.parquet(s"$state/bp_ledger")
    val docs = docsSlice(col("doc_id") % 7 === 0)
    val e1 = intercept[IllegalArgumentException] {
      BoilerplateStateStream.update(state)(docs, 5L)
    }
    assert(e1.getMessage.contains("NO layout marker"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      BoilerplateStateStream.phraseTableFromState(spark, state)
    }
    assert(e2.getMessage.contains("NO layout marker"))
    // a fresh dir stamps v2 and round-trips; the sign guard then
    // refuses a forget under an arrival's committed ledger id
    val fresh = s"$root/fresh"
    BoilerplateStateStream.update(fresh)(docs, 0L)
    assert(spark.read.parquet(s"$fresh/bp_format").collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    val e3 = intercept[IllegalArgumentException] {
      BoilerplateStateStream.forget(fresh)(docs.limit(3), 0L)
    }
    assert(e3.getMessage.contains("ARRIVAL") &&
      e3.getMessage.contains("fresh batchId"), e3.getMessage)
  }
}
