package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariants of the count-min sketch (q82's machinery) checked over
  * EVERY key in the corpus, not just the registered probes. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1024L

  private def bucket(j: Column, k: Column): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit("|"), k.cast("string"))),
      1, 8), 16, 10).cast("long"), lit(W))

  test("count-min never underestimates, and is exact for isolated buckets") {
    val src = Tables.orders(spark, sf0001)
      .select($"o_orderpriority".as("g"), $"o_custkey".as("k"))
    val jb = src.select(col("g"), col("k"), explode(array((0 until 4).map(j =>
      struct(lit(j).as("j"), bucket(lit(j), col("k")).as("b"))): _*)).as("jb"))
      .select(col("g"), col("k"), col("jb.j").as("j"), col("jb.b").as("b"))
    val cms = jb.groupBy(col("g"), col("j"), col("b")).agg(count(lit(1)).as("c"))
    // estimate every key through the sketch
    val est = jb.distinct().join(cms, Seq("g", "j", "b"))
      .groupBy(col("g"), col("k")).agg(min(col("c")).as("est"))
    val exact = src.groupBy(col("g"), col("k")).agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, Seq("g", "k"))
      .select($"g", $"k", $"est", $"exact").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3),
        s"CMS underestimated ${r.getString(0)}/${r.getLong(1)}: " +
          s"est=${r.getLong(2)} < exact=${r.getLong(3)}")
    }
    // overestimates exist only through collisions: a key alone in all four
    // of its buckets must be estimated exactly
    val collisions = jb.groupBy(col("g"), col("j"), col("b"))
      .agg(countDistinct(col("k")).as("nk"))
    val lonely = jb.distinct().join(collisions, Seq("g", "j", "b"))
      .groupBy(col("g"), col("k")).agg(max(col("nk")).as("worst"))
      .filter(col("worst") === 1)
    val lonelyChecked = lonely.join(est, Seq("g", "k")).join(exact, Seq("g", "k"))
      .filter(col("est") =!= col("exact")).count()
    assert(lonelyChecked == 0, "isolated keys must be estimated exactly")
  }
}
