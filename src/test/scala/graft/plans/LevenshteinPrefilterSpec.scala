package graft.plans

import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec, Tables}

/** The bounded-edit-distance rewrite: same rows, banded plan. */
class LevenshteinPrefilterSpec extends SparkSpec {

  // candidate pairs exactly like q60's blocked self-join, minus the
  // distance filter — the rule only touches Filter/Join conditions, so
  // the projected distance below is untouched ground truth
  private def pairs() = {
    def side(p: String) = Tables.part(spark, sf0001)
      .filter(col("p_size") === 1)
      .select(col("p_partkey").as(s"${p}_key"), col("p_name").as(s"${p}_name"),
        split(col("p_name"), " ").getItem(0).as(s"${p}_blk"))
    side("a").join(side("b"),
      col("a_blk") === col("b_blk") && col("a_key") < col("b_key"))
  }

  test("banded threshold form agrees with the unbounded distance") {
    GraftExtensions.register(spark)
    val truth = pairs()
      .select(col("a_key"), col("b_key"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expect = truth.filter(_._3 <= 10).map(t => (t._1, t._2))

    val got = pairs()
      .filter(levenshtein(col("a_name"), col("b_name")) <= 10)
      .select(col("a_key"), col("b_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"rewritten filter changed the result set " +
      s"(${(got diff expect).size} extra, ${(expect diff got).size} missing)")
    assert(expect.nonEmpty, "fixture produced no matching pairs")
  }

  test("rule injects the length prefilter and the banded threshold call") {
    GraftExtensions.register(spark)
    val plan = pairs()
      .filter(levenshtein(col("a_name"), col("b_name")) <= 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.matches("(?s).*levenshtein\\(.*(, 10\\)|Some\\(10\\)).*"),
      "no 3-arg banded levenshtein in:\n" + plan.take(800))
    assert(plan.contains("abs(") && plan.contains("length("),
      "no length prefilter in:\n" + plan.take(800))
  }

  test("rewritten predicate drops NULL rows exactly like the original") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true)))
    val rows = Seq(
      Row("kitten", "sitting"), Row(null, "x"), Row("x", null),
      Row(null, null), Row("same", "same"), Row("abcdefgh", "z"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(identity)), schema)
    val got = df.filter(levenshtein(col("a"), col("b")) <= 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // ground truth computed WITHOUT the comparison pattern (Project only,
    // untouched by the rule), filtered on the driver
    val want = df.select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).as("d"))
      .collect()
      .filter(r => !r.isNullAt(2) && r.getInt(2) <= 3)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want, s"got $got, want $want")
    assert(got == Set(("kitten", "sitting"), ("same", "same")))
  }

  test("a disjunct is NOT rewritten (deriving from inside OR is unsound)") {
    GraftExtensions.register(spark)
    val plan = pairs()
      .filter(levenshtein(col("a_name"), col("b_name")) <= 3 ||
        length(col("a_name")) > 50)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("abs("), "prefilter wrongly derived from OR branch:\n" +
      plan.take(800))
    assert(!plan.matches("(?s).*levenshtein\\(.*(, 3\\)|Some\\(3\\)).*"),
      "banded form wrongly derived from OR branch:\n" + plan.take(800))
  }
}
