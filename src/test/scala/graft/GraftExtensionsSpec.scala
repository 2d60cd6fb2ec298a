package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface: graft expressions callable from plain
  * SQL. Uses GraftExtensions.register on the shared session (the
  * withExtensions construction path binds the same builder seq). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSpec.session
    GraftExtensions.register(s)
    s
  }

  test("vec_dot / simhash64 / shingle_hash64 / minhash_sig callable from SQL") {
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  simhash64(array(-1L, -1L, 0L)) AS sh,
        |  size(shingle_hash64('a b c d')) AS nsh,
        |  size(minhash_sig('a b c d e')) AS nmh
      """.stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == -1L) // two all-ones hashes outvote one zero
    assert(row.getInt(2) == 2)    // shingles: "a b c", "b c d"
    assert(row.getInt(3) == 8)
  }

  test("wrong arity / type surfaces a clear SQL error") {
    val e = intercept[Exception](spark.sql("SELECT vec_dot(1, 2)").collect())
    assert(e.getMessage.contains("vec_dot"))
  }
}
