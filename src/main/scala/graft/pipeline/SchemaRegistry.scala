package graft.pipeline

import java.nio.charset.StandardCharsets

import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** File-keyed dynamic schema lookup, re-expressing
  * /root/reference/code/utils.py:81-130.
  *
  * Schemas are Spark `StructType` JSON serializations stored next to the
  * data at `<schemaDir>/<basename>.json`. Lookup goes through Hadoop's
  * FileSystem API, so the same code serves `file://`, `s3a://`, `hdfs://`
  * — the reference's boto3 client is replaced by the FS abstraction Spark
  * already ships.
  *
  * Missing schema → None → callers fall back to `inferSchema` (the
  * reference's behavior, utils.py:111-113). At scale, providing the
  * schema matters: inference is a full extra pass over the input.
  */
object SchemaRegistry {

  /** `data/foo-2024.csv` → `foo-2024.json`. Reference quirk preserved
    * (utils.py:130): the stem is everything before the FIRST dot, so
    * `a.b.csv` maps to `a.json`. */
  def schemaFileFor(dataFile: String): String = {
    val base = dataFile.split('/').last
    s"${base.split('.').head}.json"
  }

  /** Load the StructType for a data file, if its schema JSON exists. */
  def load(spark: SparkSession, schemaDir: String, dataFile: String): Option[StructType] = {
    val path = new Path(schemaDir, schemaFileFor(dataFile))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else Try {
      val in = fs.open(path)
      val json = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        new String(out.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
      DataType.fromJson(json).asInstanceOf[StructType]
    }.toOption
  }

  /** Parse a StructType from its JSON string (for tests / inline use). */
  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]
}
