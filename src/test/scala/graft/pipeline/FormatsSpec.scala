package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Source/sink format coverage beyond parquet: CSV and JSON through the
  * pipeline reader (the reference's two input formats), plus ORC as the
  * columnar alternative sink — all schema-stable round trips. */
class FormatsSpec extends SparkSpec {

  private lazy val sample = Tables.lineitem(spark, sf0001)
    .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    .limit(500)

  test("CSV round trip through readBatchFiles with explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = IngestPipeline.readBatchFiles(
      spark, Seq(dir), "csv", Some(sample.schema))
    assert(back.schema == sample.schema)
    assert(back.except(sample).isEmpty && sample.except(back).isEmpty)
  }

  test("JSON round trip through readBatchFiles with inference fallback") {
    val dir = Files.createTempDirectory("graft-json").toString
    sample.write.mode("overwrite").json(dir)
    val back = IngestPipeline.readBatchFiles(spark, Seq(dir), "json", None)
      .select(sample.columns.map(col): _*) // inference may reorder columns
    assert(back.count() == sample.count())
    // inferred types widen (long/double) — compare values after cast
    val cast = back.select(
      col("l_orderkey").cast("long"), col("l_partkey").cast("long"),
      col("l_quantity").cast("double"), col("l_returnflag"))
    assert(cast.except(sample).isEmpty)
  }

  test("ORC sink/source round trip") {
    val dir = Files.createTempDirectory("graft-orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.except(sample).isEmpty && sample.except(back).isEmpty)
  }

  test("unsupported format names the format in the error") {
    val e = intercept[IllegalArgumentException] {
      IngestPipeline.readBatchFiles(spark, Seq("/tmp/x.avro"), "avro", None)
    }
    assert(e.getMessage.contains("avro"))
  }
}
