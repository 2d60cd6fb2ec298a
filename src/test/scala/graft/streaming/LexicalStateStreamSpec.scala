package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** The maintained inverted index: the state-served BM25 page must equal
  * the batch q215 operator over all delivered documents — across
  * restarts and replays — and the keyed forget must leave exactly the
  * survivors' index, df/N shifts included. */
class LexicalStateStreamSpec extends SparkSpec {

  private def docsSlice(pred: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf0001)
      .filter(pred)
      .select(col("doc_id"), col("text"), col("source"))

  private val ids = Seq(0L, 100L, 200L)

  private def pageOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("query_id"), col("rn")).collect().map(_.toString).toSeq

  test("drain + restart: served page equals the batch q215 operator") {
    val root = Files.createTempDirectory("graft-lexstate").toString
    val docsDir = s"$root/docs"; val stateDir = s"$root/state"
    val ckpt = s"$root/ckpt"
    docsSlice(col("doc_id") % 10 < 8).write.parquet(docsDir)
    LexicalStateStream.start(spark, docsDir, stateDir, ckpt,
      availableNow = true).awaitTermination()
    // mid-stream: the page is exact over what has arrived
    val mid = pageOf(LexicalStateStream.bm25FromState(spark, stateDir, ids))
    val midBatch = pageOf(Similarity.bm25TopK(
      docsSlice(col("doc_id") % 10 < 8).select(col("doc_id"), col("text")),
      ids, k = 10))
    assert(mid == midBatch, "mid-stream page diverged from batch")
    // the rest arrives; restart from the same checkpoint
    docsSlice(col("doc_id") % 10 >= 8).write.mode("append").parquet(docsDir)
    LexicalStateStream.start(spark, docsDir, stateDir, ckpt,
      availableNow = true).awaitTermination()
    val fin = pageOf(LexicalStateStream.bm25FromState(spark, stateDir, ids))
    val finBatch = pageOf(Similarity.bm25TopK(
      docsSlice(lit(true)).select(col("doc_id"), col("text")), ids, k = 10))
    assert(fin == finBatch, "post-restart page diverged from batch")
  }

  test("replayed batch is a no-op; a token-less doc still counts in N") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-lexreplay").toString
    val state = s"$root/state"
    val docs = Seq(
      (0L, "apple pear"), (1L, "apple apple banana"),
      (2L, "apple pear plum"), (3L, "   ")).toDF("doc_id", "text")
    LexicalStateStream.update(state)(docs, 0L)
    LexicalStateStream.update(state)(docs, 0L) // replay
    assert(LexicalStateStream.lexdocsState(spark, state).count() == 4,
      "registry must hold every doc exactly once (token-less included)")
    val p1 = LexicalStateStream.postingsState(spark, state).count()
    LexicalStateStream.update(state)(docs, 1L) // same docs, later batch
    assert(LexicalStateStream.postingsState(spark, state).count() == p1,
      "re-delivered docs must not duplicate postings")
    // the served page equals the batch operator — including doc 3's
    // contribution to N (it shifts idf but never scores)
    val got = pageOf(LexicalStateStream.bm25FromState(spark, state,
      Seq(0L), k = 10))
    val want = pageOf(Similarity.bm25TopK(docs, Seq(0L), k = 10))
    assert(got == want, s"served page diverged:\n$got\nvs\n$want")
  }

  test("forget erases completely: page == survivors' fresh index, " +
      "df/N shifts included; replay no-op") {
    val root = Files.createTempDirectory("graft-lexforget").toString
    val state = s"$root/state"
    val docs = docsSlice(lit(true)).select(col("doc_id"), col("text"))
    LexicalStateStream.update(state)(docs.filter(col("doc_id") % 2 === 0), 0L)
    LexicalStateStream.update(state)(docs.filter(col("doc_id") % 2 =!= 0), 1L)
    val tombPred = graft.operators.Sampling.tombstoned(col("doc_id"))
    val tomb = docs.select(col("doc_id")).filter(tombPred)
    assert(tomb.limit(1).count() > 0, "fixture vacuous")
    LexicalStateStream.forget(spark, state, tomb)
    // no tombstoned residue in either table
    assert(LexicalStateStream.postingsState(spark, state)
      .filter(tombPred).isEmpty, "tombstoned postings survived")
    assert(LexicalStateStream.lexdocsState(spark, state)
      .filter(tombPred).isEmpty, "tombstoned registry rows survived")
    // the served page equals a FRESH index over only the survivors —
    // the derived df/N/avgdl must all be the survivors' values
    val got = pageOf(LexicalStateStream.bm25FromState(spark, state, ids))
    val fresh = s"$root/fresh"
    LexicalStateStream.update(fresh)(docs.filter(!tombPred), 0L)
    val want = pageOf(LexicalStateStream.bm25FromState(spark, fresh, ids))
    assert(got == want, "forgotten index diverged from survivors' fresh index")
    // and equals the batch operator over the survivors (the q218 gate)
    val batch = pageOf(Similarity.bm25TopK(docs.filter(!tombPred), ids, 10))
    assert(got == batch, "forgotten index diverged from the survivors' batch")
    // replayed forget: already-absent keys are a state no-op
    LexicalStateStream.forget(spark, state, tomb)
    assert(pageOf(LexicalStateStream.bm25FromState(spark, state, ids)) == got,
      "replayed forget changed the index")
  }
}
