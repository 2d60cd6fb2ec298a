package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{BottomKIds, KmvDistinct}
import graft.plans.TopKPerKey
import graft.sources.ZOrder

/** Property-based invariants of the round-3 custom operators, over
  * ScalaCheck-generated inputs with fixed seeds (raw ScalaCheck — the
  * scalatestplus bridge isn't on the offline classpath). Each property
  * pins a custom implementation to an independent reference formulation
  * on data the hand-written fixtures don't reach: duplicate keys, ties,
  * skewed group sizes, full-range unsigned values. */
class PropSpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("TopKPerKey equals the row_number window on random skewed data") {
    val rows = Gen.listOfN(400, for {
      key <- Gen.chooseNum(0L, 7L) // few keys -> big skewed groups
      v <- Gen.chooseNum(-1000.0, 1000.0)
      id <- Gen.chooseNum(0, 100000)
    } yield (key, v, id.toLong))
    for (seed <- 1L to 3L; k <- Seq(1, 3, 17)) {
      // (v, id) total order needs a unique id per key; dedupe DETERMINISTICALLY
      // (dropDuplicates keeps an arbitrary row, and the uncached frame is
      // recomputed separately for the operator and the reference, so the two
      // sides could disagree on which v survived -> flake)
      val df = gen(rows, seed).toDF("key", "v", "id")
        .groupBy("key", "id").agg(max("v").as("v"))
        .select("key", "v", "id")
        .repartition(5)
      val got = TopKPerKey(df, Seq("key"), Seq("v" -> false, "id" -> true), k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got == want, s"seed=$seed k=$k: ${(got diff want).size} extra, " +
        s"${(want diff got).size} missing")
    }
  }

  test("BottomKIds is mergeable: any split of the input yields the same sample") {
    val elems = Gen.listOfN(60, Gen.chooseNum(0L, 100000L))
      .map(_.distinct.map(id => ("g", f"$id%020d-hash", id)))
    val agg = new BottomKIds(7)
    for (seed <- 1L to 5L) {
      val xs = gen(elems, seed)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      for (cut <- Seq(0, 1, xs.size / 2, xs.size)) {
        val (a, b) = xs.splitAt(cut)
        val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
          b.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged) == agg.finish(whole), s"seed=$seed cut=$cut")
      }
      // and the sample is exactly the k smallest by hash key
      assert(agg.finish(whole) == xs.sortBy(e => (e._2, e._3)).take(7).map(_._3))
    }
  }

  test("KmvDistinct is mergeable and replay-idempotent; below k it is exact") {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hash(v: Long): String =
      md5.digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val elems = Gen.listOfN(300, Gen.chooseNum(0L, 500L))
      .map(_.map(v => ("g", hash(v))))
    val agg = new KmvDistinct(64)
    for (seed <- 1L to 5L) {
      val xs = gen(elems, seed)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      for (cut <- Seq(0, 1, xs.size / 2, xs.size)) {
        val (a, b) = xs.splitAt(cut)
        val bufA = a.foldLeft(agg.zero)(agg.reduce)
        val merged = agg.merge(bufA, b.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged) == agg.finish(whole), s"seed=$seed cut=$cut")
        // replay idempotence: merging a partial in AGAIN changes nothing
        assert(agg.finish(agg.merge(merged, bufA)) == agg.finish(whole))
      }
      val nd = xs.map(_._2).distinct.size
      val (kUsed, est) = agg.finish(whole)
      if (nd < 64) assert(kUsed == nd && est == nd.toDouble, "below-k must be exact")
      else {
        assert(kUsed == 64)
        assert(math.abs(est - nd) / nd < 0.5, s"estimate $est vs true $nd")
      }
    }
  }

  test("weighted sample equals a driver-side A-ES recomputation and is stable") {
    val q = SparkEntry.queries("q87_weighted_sample")
    // the registry strips the presentation sort (r17), so collected row
    // order is partitioning-dependent — canonicalize the way the driver
    // does (sort locally) before the positional compare
    val got = q(spark, sf0001)
      .as[(String, Long, Int, Long)].collect().toSeq
      .sortBy(r => (r._1, r._3))
    // independent reference: same md5-uniform, ln(u)/w ranking in plain Scala
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, w) => (-math.log(u(id)) / w, id) }
        .take(5).zipWithIndex
        .map { case ((_, id, w), i) => (src, id, i + 1, w) }
    }.sortBy(r => (r._1, r._3))
    assert(got == expected)
    // and the membership is a pure function of the data: a second run
    // returns the identical sample
    assert(q(spark, sf0001).as[(String, Long, Int, Long)].collect().toSeq
      .sortBy(r => (r._1, r._3)) == got)
  }

  test("mixture weights: capped at 1, hungriest source uncut, mix moves toward uniform") {
    val got = SparkEntry.queries("q94_mixture_weights")(spark, sf0001)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, _, tokens, _, w, exp) =>
      assert(w > 0.0 && w <= 1.0, s"$src weight $w out of range")
      assert(exp <= tokens.toDouble + 1e-9, s"$src oversampled")
      assert(exp == tokens.toDouble * w)
    }
    // exactly the scarcest source keeps weight 1 (its ratio is the max)
    assert(got.count(_._5 == 1.0) >= 1)
    assert(got.minBy(_._3)._5 == 1.0, "scarcest source must be uncut")
    // post-sampling shares are strictly closer to uniform than before
    val target = 1.0 / got.length
    val before = got.map(r => math.abs(r._4 - target)).max
    val totalExp = got.map(_._6).sum
    val after = got.map(r => math.abs(r._6 / totalExp - target)).max
    assert(after <= before + 1e-12, s"mix got worse: $after > $before")

    // and the realized q95 sample honors the weights: a weight-1 source
    // keeps every doc (u < 1 always), counts stay within bounds, and the
    // realized shares are a distribution
    val sample = SparkEntry.queries("q95_mixture_sample")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(sample.length == got.length)
    sample.foreach { case (src, nDocs, nAcc, toks, accToks, w, share) =>
      assert(nAcc <= nDocs && accToks <= toks, s"$src over-accepted")
      if (w == 1.0) assert(nAcc == nDocs, s"uncut source $src dropped docs")
      assert(share >= 0.0 && share <= 1.0)
    }
    assert(math.abs(sample.map(_._7).sum - 1.0) < 1e-9)
  }

  test("bloom property: zero false negatives on random keys, fp rate near design point") {
    val keys = gen(Gen.listOfN(400, Gen.chooseNum(Long.MinValue, Long.MaxValue)), seed = 11L)
      .distinct
    val (members, nonMembers) = keys.splitAt(keys.length / 2)
    val bits = graft.operators.Scale.Bloom.build(members.toDF("k"), "k")
    // completeness: every inserted key passes — the property exactness
    // of the q84 result rests on
    val fn = members.toDF("k")
      .filter(!graft.operators.Scale.Bloom.mightContain(bits, col("k"))).count()
    assert(fn == 0, s"$fn false negatives")
    // soundness budget: with ~200 keys in 2^16 bits / 4 probes, the
    // design fp rate is ~1e-8; even 1% would indicate broken hashing
    val fp = nonMembers.toDF("k")
      .filter(graft.operators.Scale.Bloom.mightContain(bits, col("k"))).count()
    assert(fp.toDouble / nonMembers.length.max(1) < 0.01, s"$fp false positives")
  }

  test("zvalue round-trips: de-interleaving recovers both coordinates") {
    val pair = for {
      a <- Gen.chooseNum(0L, 0xFFFFFFFFL)
      b <- Gen.chooseNum(0L, 0xFFFFFFFFL)
    } yield (a, b)
    def unspread(z: Long): Long = // inverse of the even-bit spread
      (0 until 32).foldLeft(0L)((acc, i) => acc | ((z >> (2 * i)) & 1L) << i)
    val cases = (1L to 50L).map(gen(pair, _))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(unspread(z) == a && unspread(z >>> 1) == b,
        s"morton($a, $b) = $z does not round-trip")
    }
  }
}
