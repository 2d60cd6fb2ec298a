package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.{SparkSpec, Tables}

/** The five custom state machines proven on the RocksDB state store.
  *
  * Every other streaming spec runs on the default HDFS-backed in-memory
  * provider, but the scale claim in the machines' doc comments —
  * |users|-scale state at the 100 TB north star — only holds on RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`), where state lives
  * off-heap/on-disk instead of as deserialized JVM objects. Swapping the
  * provider is exactly where case-class state encoders historically break
  * (RocksDB round-trips state through UnsafeRow bytes on EVERY access,
  * where the in-memory store can hand back the same JVM object it stored),
  * so each machine gets a full multi-micro-batch run on RocksDB asserted
  * equal to its batch twin, plus one checkpoint-stop-restart case proving
  * buffered state SURVIVES a JVM-boundary round-trip through RocksDB
  * files.
  *
  * Provider use is asserted, not assumed: the query progress must report
  * rocksdb* custom state metrics, which the default provider never emits.
  */
class RocksDBStateSpec extends SparkSpec {

  private val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def onRocksDB[T](body: => T): T = {
    val saved = scala.util.Try(spark.conf.get(ProviderKey)).toOption
    spark.conf.set(ProviderKey, RocksDBProvider)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  /** sf0.001 events + the far-future inert marker (user -1) that pushes
    * the watermark past every real event so all state finalizes. */
  private def eventsDirWithMarker(tag: String): (String, StructType, DataFrame) = {
    val dir = Files.createTempDirectory(s"graft-rocks-$tag").toString
    val batch = Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(dir)
    batch.limit(1)
      .withColumn("ts", expr("ts + INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("error"))
      .write.mode("append").parquet(dir)
    (dir, batch.schema, batch)
  }

  /** Run `f` over a multi-micro-batch file stream on RocksDB, return the
    * sink table; fails if the query never touched a RocksDB store. */
  private def runStream(name: String, dir: String, schema: StructType)(
      f: DataFrame => DataFrame): DataFrame = onRocksDB {
    val ckpt = Files.createTempDirectory(s"graft-rocks-ck-$name").toString
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = f(src).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateMetrics = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet.asScala)
    assert(stateMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"$name never reported rocksdb state metrics — the provider conf " +
        s"was ignored (saw: ${stateMetrics.distinct.take(5).mkString(", ")})")
    spark.table(name)
  }

  test("funnel machine finalizes to its batch result on RocksDB") {
    val (dir, schema, batch) = eventsDirWithMarker("funnel")
    val got = runStream("rocks_funnel", dir, schema)(
      src => FunnelStream.funnelStages(src, "40 days").toDF())
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
    val want = FunnelStream.funnelStages(batch)
      .collect().map(s => (s.user_id, s.stage, s.ts)).toSet
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing")
  }

  test("retention machine finalizes to its batch result on RocksDB") {
    val (dir, schema, batch) = eventsDirWithMarker("retention")
    val got = runStream("rocks_retention", dir, schema)(
      src => RetentionStream.retentionStages(src, "40 days").toDF())
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2))).toSet
    val want = RetentionStream.retentionStages(batch)
      .collect().map(w => (w.user_id, w.cohort_week, w.week_n)).toSet
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing")
  }

  test("EWMA day machine finalizes to its batch result on RocksDB") {
    val (dir, schema, batch) = eventsDirWithMarker("ewma")
    val got = runStream("rocks_ewma", dir, schema)(
      src => EwmaStream.ewmaStages(src, "40 days").toDF())
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    val want = EwmaStream.ewmaStages(batch).toDF()
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    assert(got == want, // bitwise: the EWMA fold must survive state round-trips
      s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
  }

  test("bigram machine finalizes to its batch result on RocksDB") {
    val (dir, schema, batch) = eventsDirWithMarker("bigram")
    val got = runStream("rocks_bigram", dir, schema)(
      src => BigramStream.bigrams(src, "40 days").toDF())
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = BigramStream.bigrams(batch).toDF()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want,
      s"${(got diff want).size} extra, ${(want diff got).size} missing")
  }

  test("sessionizer emits every batch session on RocksDB") {
    val (dir, schema, batch) = eventsDirWithMarker("sessions")
    val got = runStream("rocks_sessions", dir, schema)(
      src => StatefulSessions.sessions(src.withWatermark("ts", "40 days")).toDF())
    val want = graft.operators.EventWindows.sessions(batch)
    // marker's own session may stay open; every real session must be out
    assert(want.except(got.select(col("user_id"), col("session_start"),
      col("n_events"))).isEmpty, "sessions missing on RocksDB")
  }

  test("built-in session_window aggregation matches batch on RocksDB") {
    // the sixth stateful path: not a custom machine but Spark's own
    // session-window merging state — its state layout differs from
    // flatMapGroupsWithState's, so RocksDB coverage of the five machines
    // says nothing about it; this pins the q98 streaming twin's store
    val (dir, schema, batch) = eventsDirWithMarker("sessagg")
    val got = runStream("rocks_sessagg", dir, schema)(
      src => SessionStream.sessions(src, "40 days"))
      .filter(col("user_id") >= 0)
    val want = SessionStream.sessions(batch)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "session_window output diverged from batch on RocksDB")
  }

  test("buffered funnel state survives a stop + checkpoint restart on RocksDB") {
    // Run 1 buffers user 10's view@1h / click@2h (watermark ends at 1h,
    // so NOTHING finalizes or emits). Run 2 — a separate query started
    // from the same checkpoint — appends purchase@3h plus a marker that
    // drives the watermark to 9h, finalizing all three stages. The three
    // emitted records therefore prove the RPending buffer written by run
    // 1 was read back out of RocksDB checkpoint files by run 2; with
    // lost state the purchase would find no prior stages and emit only
    // stage 1 (or nothing).
    val dir = Files.createTempDirectory("graft-rocks-restart").toString
    val ckpt = Files.createTempDirectory("graft-rocks-restart-ck").toString
    // memory sinks cannot recover a checkpoint; the restart needs the
    // fault-tolerant file sink, which replays its _spark_metadata log
    val outDir = Files.createTempDirectory("graft-rocks-restart-out").toString
    val spark0 = spark
    import spark0.implicits._
    def hours(h: Double): java.sql.Timestamp =
      new java.sql.Timestamp((h * 3600 * 1000).toLong)
    def write(rows: (Long, Double, Long, String)*): Unit =
      rows.toSeq
        .map { case (id, h, u, t) => (id, hours(h), u, t) }
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)

    // changelog checkpointing is the production RocksDB configuration at
    // scale (per-batch deltas instead of full SST re-uploads); running
    // the restart under it proves the recommended conf round-trips state
    val ChangelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    def run(): Unit = onRocksDB {
      val saved = scala.util.Try(spark.conf.get(ChangelogKey)).toOption
      spark.conf.set(ChangelogKey, "true")
      try {
        val schema = spark.read.parquet(dir).schema
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        val q = FunnelStream.funnelStages(src, "1 hour").toDF()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally saved match {
        case Some(v) => spark.conf.set(ChangelogKey, v)
        case None    => spark.conf.unset(ChangelogKey)
      }
    }

    write((1L, 1.0, 10L, "view"), (2L, 2.0, 10L, "click"))
    run()
    // the sink commits (possibly empty) part files per batch; guard the
    // spark.read against the no-files-at-all case, which has no schema
    if (new java.io.File(outDir).listFiles().exists(_.getName.endsWith(".parquet")))
      assert(spark.read.parquet(outDir).count() == 0,
        "run 1 must emit nothing — the watermark never passed its events")
    // RocksDB checkpoints state as versioned zip snapshots and (under
    // changelog checkpointing) .changelog deltas — their presence pins
    // that run 2 starts from RocksDB files, not JVM memory
    val stateFiles = Files.walk(java.nio.file.Paths.get(ckpt, "state"))
      .iterator().asScala
      .count(p => p.toString.endsWith(".zip") || p.toString.endsWith(".changelog"))
    assert(stateFiles > 0, "no RocksDB snapshot/changelog files under the checkpoint")

    write((3L, 3.0, 10L, "purchase"), (90L, 10.0, -1L, "error"))
    run()
    val got = spark.read.parquet(outDir).filter(col("user_id") === 10L)
      .collect().map(r => (r.getInt(1), r.getTimestamp(2).getTime / 3600000.0)).toSet
    assert(got == Set((1, 1.0), (2, 2.0), (3, 3.0)),
      s"state did not survive the RocksDB restart: got $got")
  }
}
