package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState, Trigger}

import graft.{SparkSpec, Tables}

/** Batch-equivalence + state-carry unit paths for the streaming bigram
  * (transition) records: the same transition code runs (a) in batch mode
  * against q86's lag() formulation, and (b) as a real multi-micro-batch
  * stream that must finalize to the identical record set. */
class BigramStreamSpec extends SparkSpec {

  /** q86's pairs, computed independently via the lag() window. */
  private def expectedBigrams(ev: DataFrame): Set[(Long, String, String, Timestamp)] = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getString(4), r.getString(1), r.getTimestamp(2)))
      .toSet
  }

  test("batch run of the bigram machine equals the lag() window pairs") {
    val ev = Tables.events(spark, sf0001)
    val got = BigramStream.bigrams(ev)
      .collect().map(b => (b.user_id, b.prev, b.next, b.ts)).toSet
    val want = expectedBigrams(ev)
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing of ${want.size}")
    // and the downstream matrix counts agree with q86's count column
    val counts = BigramStream.bigramCounts(BigramStream.bigrams(ev))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val wantCounts = want.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    assert(counts == wantCounts)
  }

  test("streaming bigrams finalize to the batch result across micro-batches") {
    val dir = Files.createTempDirectory("graft-bigram").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    // far-future inert marker: pushes the watermark past every real event
    batch.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .write.mode("append").parquet(dir)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = BigramStream.bigrams(src, "40 days")
      .writeStream.format("memory").queryName("bigram_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("bigram_out")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getTimestamp(3)))
      .toSet
    val want = expectedBigrams(batch)
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing of ${want.size}")
    // append-mode emission is exactly-once per pair
    assert(spark.table("bigram_out").filter(col("user_id") >= 0).count() == want.size)
  }

  // --- TestGroupState unit paths ---

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000)
  private def usOf(s: Long): Long = s * 1000000L

  private def state(wmMs: Long, st: Option[BigramStream.BigramState] = None) =
    TestGroupState.create[BigramStream.BigramState](
      optionalState = st.map(Optional.of[BigramStream.BigramState])
        .getOrElse(Optional.empty[BigramStream.BigramState]()),
      timeoutConf = GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(java.lang.Long.valueOf(wmMs).longValue()),
      hasTimedOut = false)

  private def ev(id: Long, sec: Long, tpe: String) =
    BigramStream.BEv(id, ts(sec), 1L, tpe)

  test("the last-event carry bridges micro-batches without losing a pair") {
    // invocation 1: view@100 arrives on time (wm = 0) and buffers
    val gs1 = state(wmMs = 0L)
    val out1 = BigramStream.transition(1L, Iterator(ev(1, 100, "view")), gs1).toList
    assert(out1.isEmpty && gs1.get.buf.size == 1)
    // invocation 2 (timeout, wm past the view): it finalizes — no pair
    // yet, but the carry must now hold it
    val gs2 = state(wmMs = 200000L, st = Some(gs1.get))
    val out2 = BigramStream.transition(1L, Iterator.empty, gs2).toList
    assert(out2.isEmpty)
    assert(gs2.get.last.map(_.tpe).contains("view"))
    // invocation 3: click@300 arrives on time and buffers
    val gs3 = state(wmMs = 200000L, st = Some(gs2.get))
    assert(BigramStream.transition(1L, Iterator(ev(2, 300, "click")), gs3).toList.isEmpty)
    // invocation 4 (timeout): the click finalizes against the CARRIED view
    val gs4 = state(wmMs = 400000L, st = Some(gs3.get))
    val out4 = BigramStream.transition(1L, Iterator.empty, gs4).toList
    assert(out4.map(b => (b.prev, b.next)) == List(("view", "click")))
    assert(gs4.get.last.map(_.tpe).contains("click"))
  }

  test("late events drop rather than pairing out of order") {
    // carry = click@300, watermark at 400: a view@100 is beyond-horizon
    // late; pairing it would reorder the finalized sequence
    val st0 = BigramStream.BigramState(
      Some(BigramStream.BPending(usOf(300), 2L, "click")), Nil)
    val gs = state(wmMs = 400000L, st = Some(st0))
    val out = BigramStream.transition(1L, Iterator(ev(1, 100, "view")), gs).toList
    assert(out.isEmpty, s"late event must not emit: $out")
    assert(gs.get.last.map(_.tpe).contains("click"), "carry must be untouched")
  }

  test("buffered events drain in (ts, event_id) order on timeout") {
    val st0 = BigramStream.BigramState(None, Seq(
      BigramStream.BPending(usOf(150), 9L, "click"),
      BigramStream.BPending(usOf(100), 7L, "view"),
      BigramStream.BPending(usOf(150), 3L, "error")))
    val gs = state(wmMs = 1000000L, st = Some(st0))
    val out = BigramStream.transition(1L, Iterator.empty, gs).toList
    // order: view@100, error@150 (id 3), click@150 (id 9)
    assert(out.map(b => (b.prev, b.next)) ==
      List(("view", "error"), ("error", "click")))
  }
}
