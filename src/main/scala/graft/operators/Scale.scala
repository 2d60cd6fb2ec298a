package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale utilities that only pay off beyond local mode but must be part
  * of the library's surface: skew-salted joins and bucketed co-located
  * joins (SURVEY.md §7.4 "100 TB posture").
  */
object Scale {

  /** Join a skew-prone fact to a dimension on `key`, salting the fact
    * side so one hot key spreads over `saltFactor` reducers. The dim side
    * is replicated ×saltFactor (dim must be small-ish — if it were big,
    * you'd use AQE skew-join instead). Result equals the plain join.
    *
    * The salt is derived from a hash of the whole fact row (values-based,
    * deterministic under retries — no rand(), which would break task
    * replay at scale). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val explodedDim = dim.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(explodedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so the subsequent join is
    * co-located (no shuffle on either side). Requires a saveAsTable
    * catalog write — the lakehouse deployment shape. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 16): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
