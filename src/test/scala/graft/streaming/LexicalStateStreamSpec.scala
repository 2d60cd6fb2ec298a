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
    // the positional tier serves the SAME phrase page as the batch
    // operator over all delivered documents (the q223 gate's substance)
    val phr = pageOf(LexicalStateStream.phraseFromState(spark, stateDir, ids))
    val phrBatch = pageOf(Similarity.phraseMatchTopK(
      docsSlice(lit(true)).select(col("doc_id"), col("text")), ids, k = 10))
    assert(phr == phrBatch, "served phrase page diverged from batch")
    val prox = pageOf(
      LexicalStateStream.proximityFromState(spark, stateDir, ids))
    val proxBatch = pageOf(Similarity.proximityTopK(
      docsSlice(lit(true)).select(col("doc_id"), col("text")), ids, k = 10))
    assert(prox == proxBatch, "served proximity page diverged from batch")
    val pas = pageOf(
      LexicalStateStream.passageFromState(spark, stateDir, ids))
    val pasBatch = pageOf(Similarity.passageTopK(
      docsSlice(lit(true)).select(col("doc_id"), col("text")), ids, k = 10))
    assert(pas == pasBatch, "served passage page diverged from batch")
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
    // the length table and the counter both see each doc exactly once:
    // 2 + 3 + 3 tokens plus the whitespace doc's single empty-string
    // token (trim-then-split yields [''] on both engines — the parity
    // contract, and why N == |doclens| under THIS tokenizer), and the
    // folded counter must agree with them to the integer
    val dls = LexicalStateStream.doclensState(spark, state)
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dls.toSeq == Seq((0L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)),
      s"doclens diverged: ${dls.toSeq}")
    val st = LexicalStateStream.lexstatsState(spark, state).collect()(0)
    assert(st.getLong(0) == 4L && st.getLong(1) == 9L,
      s"lexstats counter diverged: $st")
    val p1 = LexicalStateStream.postingsState(spark, state).count()
    LexicalStateStream.update(state)(docs, 1L) // same docs, later batch
    assert(LexicalStateStream.postingsState(spark, state).count() == p1,
      "re-delivered docs must not duplicate postings")
    // fold the counter to one snapshot row: the read is unchanged, a
    // REPLAY of a folded batch is still a no-op (its delta derives from
    // registry-new docs, empty for a completed batch), and re-folding
    // is a row no-op
    val (fb, fa) = LexicalStateStream.foldLexstats(spark, state)
    assert(fb >= 1 && fa == 1L, s"fold rows $fb -> $fa")
    LexicalStateStream.update(state)(docs, 0L) // replay of a folded batch
    val stF = LexicalStateStream.lexstatsState(spark, state).collect()(0)
    assert(stF.getLong(0) == 4L && stF.getLong(1) == 9L,
      s"replay after fold shifted the counter: $stF")
    LexicalStateStream.foldLexstats(spark, state) // re-fold no-op
    assert(LexicalStateStream.doclensState(spark, state).count() == 4,
      "re-delivered docs must not duplicate lengths")
    val st2 = LexicalStateStream.lexstatsState(spark, state).collect()(0)
    assert(st2.getLong(0) == 4L && st2.getLong(1) == 9L,
      s"re-delivery shifted the counter: $st2")
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
    // no tombstoned residue in any keyed table
    assert(LexicalStateStream.postingsState(spark, state)
      .filter(tombPred).isEmpty, "tombstoned postings survived")
    assert(LexicalStateStream.poslistsState(spark, state)
      .filter(tombPred).isEmpty, "tombstoned positional postings survived")
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
    // the positional tier too: forgotten phrase page == survivors'
    // batch phrase page (the q224 gate's substance)
    val phrGot = pageOf(LexicalStateStream.phraseFromState(spark, state, ids))
    val phrWant = pageOf(Similarity.phraseMatchTopK(
      docs.filter(!tombPred), ids, 10))
    assert(phrGot == phrWant,
      "forgotten positional tier diverged from the survivors' batch")
    // and the SAME forgotten tier serves the proximity read too (q227)
    val proxGot = pageOf(
      LexicalStateStream.proximityFromState(spark, state, ids))
    val proxWant = pageOf(Similarity.proximityTopK(
      docs.filter(!tombPred), ids))
    assert(proxGot == proxWant,
      "forgotten proximity read diverged from the survivors' batch")
    // replayed forget: already-absent keys are a state no-op
    LexicalStateStream.forget(spark, state, tomb)
    assert(pageOf(LexicalStateStream.bm25FromState(spark, state, ids)) == got,
      "replayed forget changed the index")
    // the counter snapshot is the survivors' exact totals
    val want2 = LexicalStateStream.lexstatsState(spark, fresh).collect()(0)
    val got2 = LexicalStateStream.lexstatsState(spark, state).collect()(0)
    assert(got2.getLong(0) == want2.getLong(0) &&
      got2.getLong(1) == want2.getLong(1),
      s"post-forget counter diverged: $got2 vs $want2")
  }

  test("every forget crash window refuses reads, then heals — page == " +
      "survivors' index at each injection point") {
    val docs = docsSlice(lit(true)).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 120)
    val tombPred = graft.operators.Sampling.tombstoned(col("doc_id"))
    val tomb = docs.select(col("doc_id")).filter(tombPred)
    assert(tomb.limit(1).count() > 0, "fixture vacuous")
    val fresh = Files.createTempDirectory("graft-lexcrash-want").toString
    LexicalStateStream.update(s"$fresh/state")(docs.filter(!tombPred), 0L)
    val want = pageOf(LexicalStateStream.bm25FromState(spark,
      s"$fresh/state", Seq(0L, 100L)))
    val wantPhr = pageOf(LexicalStateStream.phraseFromState(spark,
      s"$fresh/state", Seq(0L, 100L)))
    // 0 = staged only; 1..5 = crash after each table swap
    (0 to 5).foreach { step =>
      val root = Files.createTempDirectory(s"graft-lexcrash$step").toString
      val state = s"$root/state"
      LexicalStateStream.update(state)(docs, 0L)
      intercept[IllegalStateException] {
        LexicalStateStream.forgetImpl(spark, state, tomb,
          crashAfterSwap = step)
      }
      // mid-window: every public read refuses loudly — a silent read
      // here would serve df/N/avgdl from inconsistent tables
      val e = intercept[IllegalArgumentException] {
        LexicalStateStream.bm25FromState(spark, state, Seq(0L, 100L))
      }
      assert(e.getMessage.contains("forget_pending"),
        s"step $step refusal names the marker: ${e.getMessage}")
      intercept[IllegalArgumentException] {
        LexicalStateStream.postingsState(spark, state)
      }
      // a mid-window APPEND must refuse too
      intercept[IllegalArgumentException] {
        LexicalStateStream.update(state)(docs.limit(1), 9L)
      }
      LexicalStateStream.recoverForget(spark, state)
      assert(pageOf(LexicalStateStream.bm25FromState(spark, state,
        Seq(0L, 100L))) == want,
        s"step $step healed index diverged from the survivors' fresh index")
      assert(pageOf(LexicalStateStream.phraseFromState(spark, state,
        Seq(0L, 100L))) == wantPhr,
        s"step $step healed positional tier diverged from the survivors'")
    }
  }

  test("a populated pre-versioning (v1) dir refuses loudly with the " +
      "rebuild instruction; an evolved-version marker refuses too") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-lexvintage").toString
    val state = s"$root/state"
    // simulate an r16-vintage dir: postings + lexdocs, NO marker and no
    // doclens/lexstats — the r17 read would serve a null avgdl from it
    Seq((0L, "apple pear", "s")).toDF("doc_id", "text", "source")
      .select(col("doc_id")).write.parquet(s"$state/lexdocs")
    val e = intercept[IllegalArgumentException] {
      LexicalStateStream.bm25FromState(spark, state, Seq(0L))
    }
    assert(e.getMessage.contains("NO layout marker") &&
      e.getMessage.toLowerCase.contains("rebuild"),
      s"vintage refusal must carry the rebuild instruction: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      LexicalStateStream.update(state)(
        Seq((1L, "plum")).toDF("doc_id", "text"), 0L)
    }
    // an early-r17 v2-marked dir must refuse under the v3 build too —
    // its positional tier is silently EMPTY, not absent, so a silent
    // read would serve every phrase query zero matches
    val root2 = Files.createTempDirectory("graft-lexv2").toString
    val state2 = s"$root2/state"
    Seq(0L).toDF("doc_id").write.parquet(s"$state2/lexdocs")
    Seq(2).toDF("version").write.parquet(s"$state2/lexical_format")
    val e2 = intercept[IllegalArgumentException] {
      LexicalStateStream.phraseFromState(spark, state2, Seq(0L))
    }
    assert(e2.getMessage.contains("v2") && e2.getMessage.contains("v3"),
      s"stale-version refusal must name both versions: ${e2.getMessage}")
  }
}
