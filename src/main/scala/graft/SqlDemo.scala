package graft

import org.apache.spark.sql.SparkSession

/** Minimal example of the SQL-only deployment surface: a session built
  * with GraftExtensions, querying the graft expressions from plain SQL
  * over the testdata views.
  *
  * Usage: sbt "runMain graft.SqlDemo [sfDir]"
  */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    println("[sql-demo] top self-similarities via vec_dot:")
    spark.sql(
      """SELECT vec_id, round(vec_dot(embedding, embedding), 4) AS norm_sq
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin).show()
    println("[sql-demo] simhash + shingle + minhash from SQL:")
    spark.sql(
      """SELECT doc_id,
        |  simhash64(transform(split(trim(text), '\\s+'), w -> xxhash64(w))) AS simhash,
        |  size(shingle_hash64(text)) AS n_shingles,
        |  minhash_sig(text)[0] AS mh0
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).show(truncate = false)
    spark.stop()
  }
}
