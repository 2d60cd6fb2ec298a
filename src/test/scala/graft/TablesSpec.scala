package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the testdata loader contract, above all the `events.ts` type.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped `ts` under three physical parquet encodings (INT64 nanos,
  * TIMESTAMP_NTZ micros, instant-adjusted micros). Round 7's regeneration
  * flipped it to NTZ and silently dropped the four `unix_micros(ts)` call
  * sites (q20/q43/q51/q89) from the correctness artifact — Verify catches
  * per-query errors, so the failure surfaced as *absence*, not redness.
  * This suite makes any future encoding flip a loud `sbt test` failure.
  */
class TablesSpec extends SparkSpec {

  test("events.ts normalizes to instant-semantics TIMESTAMP at every shipped SF") {
    for (d <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$d/events.parquet ts read as ${ev.schema("ts").dataType}")
      // The whole point of the normalization: instant functions resolve.
      assert(ev.select(unix_micros(col("ts"))).limit(1).count() == 1)
    }
  }

  test("NTZ-encoded events normalize to the same instants DuckDB's naive-as-UTC read assigns") {
    // Write an events-shaped parquet with an NTZ ts (Spark writes NTZ for
    // TimestampNTZType), reload through Tables.events, and check the
    // micros-since-epoch match the naive wall-clock interpreted as UTC.
    val dir = Files.createTempDirectory("graft-ntz").toFile
    dir.deleteOnExit()
    val src = spark.range(3).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L)
        .cast(TimestampNTZType).as("ts"),
      col("id").as("user_id"),
      lit("click").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"))
    src.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir.toString)
    assert(back.schema("ts").dataType == TimestampType)
    val micros = back.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(micros.sameElements(Array(1700000000000000L, 1700000001000000L, 1700000002000000L)))
  }

  test("nanos-as-long events truncate to micros (legacy encoding path)") {
    val dir = Files.createTempDirectory("graft-nanos").toFile
    dir.deleteOnExit()
    // A raw LongType ts column models the nanosAsLong read of INT64 nanos.
    spark.range(2).select(
      col("id").as("event_id"),
      (lit(1700000000000000000L) + col("id") * lit(1500L)).as("ts"),
      col("id").as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = Tables.events(spark, dir.toString)
    assert(back.schema("ts").dataType == TimestampType)
    val micros = back.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    // 1500 ns truncates away: both rows land on the same micro boundary ± 1us
    assert(micros.sameElements(Array(1700000000000000L, 1700000000000001L)))
  }

  test("orders/lineitem timestamps normalize across the three encodings (r7-hazard guard)") {
    // the r7 incident hit events.ts; o_orderdate/l_shipdate carry the
    // identical hazard if a regeneration flips their physical encoding —
    // pin the shared normalizeTs path on both loaders with NTZ fixtures
    val dir = Files.createTempDirectory("graft-ts-tables").toFile
    dir.deleteOnExit()
    spark.range(2).select(
      col("id").as("o_orderkey"), col("id").as("o_custkey"),
      lit("O").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 86400000000L)
        .cast(TimestampNTZType).as("o_orderdate"),
      lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val o = Tables.orders(spark, dir.toString)
    assert(o.schema("o_orderdate").dataType == TimestampType)
    // pin the VALUES, not just the dtype: the NTZ wall-clock must map to
    // the same instants DuckDB's naive-as-UTC read assigns
    val oMicros = o.select(unix_micros(col("o_orderdate")))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(oMicros.sameElements(Array(1700000000000000L, 1700086400000000L)),
      "NTZ o_orderdate instants diverged from naive-as-UTC")
    spark.range(2).select(
      col("id").as("l_orderkey"), col("id").as("l_partkey"),
      col("id").as("l_suppkey"), lit(1).as("l_linenumber"),
      lit(1.0).as("l_quantity"), lit(1.0).as("l_extendedprice"),
      lit(0.0).as("l_discount"), lit(0.0).as("l_tax"),
      lit("N").as("l_returnflag"), lit("O").as("l_linestatus"),
      (lit(1700000000000000000L) + col("id") * 1500L).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val li = Tables.lineitem(spark, dir.toString)
    assert(li.schema("l_shipdate").dataType == TimestampType)
    val micros = li.select(unix_micros(col("l_shipdate")))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(micros.sameElements(Array(1700000000000000L, 1700000000000001L)),
      "nanos-as-long l_shipdate must truncate to micros")
    // the shipped testdata (already instant micros) passes through unchanged
    assert(Tables.orders(spark, sf0001).schema("o_orderdate").dataType == TimestampType)
    assert(Tables.lineitem(spark, sf0001).schema("l_shipdate").dataType == TimestampType)
  }

  test("all ten tables load with stable column names") {
    val expected = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    for (n <- Tables.names) {
      val df = Tables.load(spark, sf0001, n)
      val key = expected(n)
      assert(df.columns.contains(key),
        s"$n missing expected key column $key (has ${df.columns.mkString(",")})")
    }
  }
}
