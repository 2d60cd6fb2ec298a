package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components on an empty pair set is empty, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.connectedComponents(empty).isEmpty)
  }

  test("connected components merge across multi-hop chains") {
    // chain 1-2-3-4 (diameter 3 — needs propagation, not one join) and
    // the isolated pair 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components fail loud when the diameter exceeds maxIters") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 2).collect()
    }
    val got = Dedup.connectedComponents(chain, maxIters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.toSet == Set(1L) && got.size == 8)
  }

  test("shingles produce n-grams in order, distinct") {
    val got = Seq("a b c d", "x x x x").toDF("text")
      .select(shingles(col("text")).as("s")).collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got(1).getSeq[String](0) == Seq("x x x")) // distinct
  }

  test("shingles of short text yield empty array, not a crash") {
    val got = Seq("one two").toDF("text")
      .select(shingles(col("text")).as("s")).collect()
    assert(got(0).getSeq[String](0).isEmpty)
  }

  test("ShingleText (compiled) matches composable shingles() and hashes to ShingleHash64") {
    // the q106 emitter must agree with the interpreted reference form on
    // order+distinctness, and its text must hash (xxhash64 = XXH64 seed
    // 42, Spark's own) to exactly what the dedup family joins on — the
    // 'one notion of a shingle' contract claimed in its scaladoc
    val df = Seq("a b c d a b c", "one two", "  p   q\tr  ", "x x x x")
      .toDF("text")
    val rows = df.select(
      shingles(col("text")).as("ref"),
      graft.expressions.ShingleText(col("text"), 3).as("got"),
      graft.expressions.ShingleHash64(col("text"), 3).as("hs"),
      transform(graft.expressions.ShingleText(col("text"), 3),
        s => xxhash64(s)).as("rehashed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("exact dedup collapses a doubled corpus to one keeper per group") {
    val docs = Tables.documents(spark, sf0001)
    val doubled = docs.select($"doc_id", $"text")
      .union(docs.select($"doc_id" + 1000000, $"text"))
    val deduped = Dedup.exactDedup(doubled)
    assert(deduped.count() == docs.count())
    assert(deduped.filter($"n_copies" =!= 2).count() == 0)
    // keeper is always the original, not the shifted copy
    assert(deduped.filter($"keep_doc_id" >= 1000000).count() == 0)
  }

  test("chunk dedup matches an independent driver-side recomputation") {
    // the real corpus DOES contain cross-doc duplicate chunks (short
    // ragged tails collide), so this exercises genuine claims
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    def chunksOf(text: String): Seq[(String, Int)] =
      text.split(" ", -1).grouped(8).map(_.mkString(" ")).zipWithIndex.toSeq
    val firstOwner = scala.collection.mutable.Map.empty[String, (Long, Int)]
    rows.foreach { case (id, text) =>
      chunksOf(text).foreach { case (ch, i) =>
        if (!firstOwner.contains(ch)) firstOwner(ch) = (id, i)
      }
    }
    val expected = rows.map { case (id, text) =>
      val cs = chunksOf(text)
      val kept = cs.filter { case (ch, i) => firstOwner(ch) == ((id, i)) }
      (id, cs.size.toLong, kept.size.toLong, kept.map(_._1).mkString(" "))
    }.toSeq
    val got = Dedup.chunkDedup(docs).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == expected)
  }

  test("length histogram: shares sum to 1 and the cumulative curve ends at 1.0 exactly") {
    val got = graft.SparkEntry.queries("q88_length_histogram")(spark, sf0001)
      .as[(String, Int, Long, Double, Double)].collect()
    assert(got.map(_._3).sum == Tables.documents(spark, sf0001).count())
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
      // cum_share is total/total = an EXACT 1.0 on the last bucket
      assert(rows.maxBy(_._2)._5 == 1.0, s"$lang cumulative curve")
      assert(rows.map(_._2).distinct.length == rows.length)
    }
  }

  test("chunk dedup: claimed passages drop, unique passages survive") {
    // doc 1: chunks A B; doc 2: A repeated within itself + unique C;
    // doc 3: a short sub-chunk doc
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $b"),
      (2L, s"$a $a $c"),
      (3L, "x y z")).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 2L, 2L, s"$a $b")))
    // doc 2 loses both copies of A (claimed by doc 1 AND by its own
    // first occurrence — which is itself claimed by doc 1), keeps C
    assert(got(1) == ((2L, 3L, 1L, c)))
    assert(got(2) == ((3L, 1L, 1L, "x y z")))
  }

  test("chunk dedup: a doc whose every passage is claimed keeps nothing") {
    val a = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs).orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 1L, 1L, a)))
    assert(got(1) == ((2L, 1L, 0L, "")))
  }

  test("source overlap: a mirrored source scores 1.0, disjoint sources are absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "A"),
      (2L, "zeta eta theta iota kappa", "A"),
      (1001L, "alpha beta gamma delta epsilon", "A-mirror"), // full copy of doc 1
      (2001L, "wholly unrelated words live here", "B"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // the mirror contains exactly doc 1's shingles: min-side coverage 1.0
    assert(got(("A", "A-mirror"))._2 == 1.0)
    assert(got(("A", "A-mirror"))._1 == 3L) // 5 words -> 3 distinct 3-grams
    // B shares nothing with anyone — no pair rows at all
    assert(!got.keySet.exists { case (a, b) => a == "B" || b == "B" })
  }

  test("incremental near-dup equals the full pair set restricted to the delta") {
    val docs = Tables.documents(spark, sf0001)
    val isNew = Sampling.hashBucket($"doc_id") >= "e6"
    val inc = Dedup.incrementalNearDupPairs(docs, isNew, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    val newIds = docs.filter(isNew).select($"doc_id").as[Long].collect().toSet
    assert(newIds.nonEmpty && newIds.size < docs.count())
    val full = Dedup.simhashNearDupPairs(docs, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(inc == full.filter(p => newIds(p._1) || newIds(p._2)),
      s"incremental ${inc.size} vs expected subset of full ${full.size}")
    // the incremental path must never produce an old x old pair
    assert(inc.forall(p => newIds(p._1) || newIds(p._2)))
  }

  test("minhash LSH candidates cover the high-jaccard pairs") {
    val docs = Tables.documents(spark, sf0001)
    val truePairs = Dedup.ngramJaccardPairs(docs, 0.3)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "corpus should contain planted near-dups")
    val recall = truePairs.count(candidates.contains).toDouble / truePairs.size
    assert(recall >= 0.8, s"LSH recall $recall over ${truePairs.size} true pairs")
  }

  test("simhash banding is exact vs brute force within its hamming budget") {
    val docs = Tables.documents(spark, sf0001)
    // brute-force ground truth over the collected signatures (test-only;
    // the operator itself never does this)
    val sigs = docs
      .select($"doc_id",
        graft.expressions.SimHash64(
          tokenHashesFromHex(md5TokenHex($"text"))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val brute = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2 && ham(s1, s2) <= 8
    } yield (d1, d2) -> ham(s1, s2)).toMap
    val got = Dedup.simhashNearDupPairs(docs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // reported pairs are true pairs with the true distance…
    got.foreach { case (p, h) => assert(brute.get(p).contains(h), s"$p -> $h") }
    // …and the pigeonhole guarantee holds: 4 bands, <= 3 differing bits
    // means at least one band is untouched, so the pair MUST be caught
    val within3 = brute.filter(_._2 <= 3).keySet
    assert(within3.nonEmpty, "corpus should contain planted near-dups")
    assert(within3.forall(got.contains),
      s"banding missed ham<=3 pairs: ${within3.filterNot(got.contains)}")
  }

  test("near-dup survivors match a driver-side union-find over the same pairs") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // independent reference: classic union-find, then argmax per root
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val chars = docs.select($"doc_id", $"n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = parent.keys.toSeq.groupBy(find).map { case (_, members) =>
      val comp = members.min
      val survivor = members.maxBy(m => (chars(m), -m))
      comp -> (members.size.toLong, survivor)
    }
    val got = Dedup.nearDupSurvivors(docs, maxHamming = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want,
      s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet} " +
        s"diff=${got.filter { case (k, v) => want.get(k).exists(_ != v) }}")
  }

  test("contamination reports a test doc duplicated from the train split") {
    // md5-bucket split membership is a pure function of doc_id — pick ids
    // on each side of the cut the same way the operator will
    def bucket(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x"
    }
    val trainId = (0L to 999L).find(bucket(_) < "cc").get
    val testId = (0L to 999L).find(bucket(_) >= "e6").get
    val cleanId = (testId + 1 to 1999L).find(bucket(_) >= "e6").get
    val docs = Seq(
      (trainId, "alpha beta gamma delta epsilon"),
      (testId, "alpha beta gamma delta epsilon"), // exact dup of a train doc
      (cleanId, "zeta eta theta iota kappa")      // test doc, uncontaminated
    ).toDF("doc_id", "text")
    val got = Dedup.contamination(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(testId), s"expected only $testId, got $got")
    val (nSh, nShared, rate) = got(testId)
    assert(nSh == 3 && nShared == 3 && rate == 1.0, got(testId).toString)
  }

  test("simhash: near-identical docs have small hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different content about database engines and shuffles"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
      .select($"doc_id", simhash64($"text").as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
    assert(ham(m(1L), m(2L)) <= 16)
  }

  test("portable md5 simhash/rolling match an independent in-JVM reference") {
    // the same semantics q35's DuckDB twin re-derives nibble-wise: token hash
    // = first 16 md5 hex chars, per-bit majority vote; rolling fold mod 1e9+7
    def refPair(text: String): (String, Long) = {
      val toks = text.trim.split("\\s+", -1)
      val votes = new Array[Int](64)
      var acc = 0L
      val P = 1000000007L
      toks.foreach { w =>
        val hx = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val h64 = java.lang.Long.parseUnsignedLong(hx.take(16), 16)
        (0 until 64).foreach(b =>
          votes(b) += (if (((h64 >>> b) & 1L) != 0L) 1 else -1))
        acc = (acc * 31L + java.lang.Long.parseLong(hx.take(8), 16) % P) % P
      }
      val sig = (0 until 64).foldLeft(0L)((s, b) =>
        if (votes(b) > 0) s | (1L << b) else s)
      (f"$sig%016x", acc)
    }
    val texts = Seq("the quick brown fox", "a", "a b a b a",
      "punctuation, stays! in tokens", "singleword")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", simhashHex($"text").as("sh"), rollingHashMd5($"text").as("rh"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refPair(t), s"text '$t'")
    }
  }

  test("rolling hash is order-sensitive, fingerprint is not punctuation-sensitive") {
    val df = Seq(("a b c", 1), ("c b a", 2), ("a, b... c!", 3)).toDF("text", "id")
      .select($"id", rollingHash($"text").as("rh"), fingerprint($"text").as("fp"))
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val byId = rows.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(1)._1 != byId(2)._1) // order matters for rolling hash
    assert(byId(1)._2 == byId(3)._2) // normalization strips punctuation
  }

  test("langId flags CJK text as zh and prefers matching stopword profile") {
    val df = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("el gato y la casa de los vecinos que", "es"),
      ("der hund und die katze ist ein tier", "de"),
      ("这是一段中文文本", "zh")).toDF("text", "expected")
      .withColumn("got", TextAnalysis.langId($"text"))
    assert(df.filter($"got" =!= $"expected").count() == 0)
  }

  test("minhash calibration: identical docs land in the 8/8 bucket at truth 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "b", "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "c", "totally different words entirely unrelated content here now"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.minhashCalibration(docs).collect()
    assert(got.length == 1, "only the identical pair is a band candidate")
    val r = got.head
    assert(r.getInt(0) == 8 && r.getDouble(1) == 1.0)
    assert(r.getLong(2) == 1)
    assert(r.getDouble(3) == 1.0, "true jaccard of identical docs")
    assert(r.getDouble(4) == 0.0, "estimator error of identical docs")
  }

  test("minhash calibration: buckets cover the candidate set with sane ranges") {
    val docs = Tables.documents(spark, sf001)
    val got = Dedup.minhashCalibration(docs).collect()
    assert(got.nonEmpty)
    val nPairs = Dedup.minhashCandidatesCapped(docs, 8, 2, 1000).count()
    assert(got.map(_.getLong(2)).sum == nPairs,
      "every candidate pair must land in exactly one agreement bucket")
    for (r <- got) {
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 8)
      assert(r.getDouble(1) == r.getInt(0) / 8.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("clean holdout reconciles with the contamination report and the split") {
    val docs = Tables.documents(spark, sf001)
    val got = Dedup.cleanHoldout(docs).collect()
    assert(got.nonEmpty)
    val splitOf = docs.select(col("doc_id"), col("source"),
        Sampling.splitOf(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val testBySource = splitOf.values.filter(_._2 == "test")
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val badBySource = Dedup.contamination(docs).select(col("doc_id"))
      .collect().map(_.getLong(0))
      .filter(d => splitOf(d)._2 == "test")
      .groupBy(d => splitOf(d)._1).view.mapValues(_.size.toLong).toMap
    for (r <- got) {
      val s = r.getString(0)
      assert(r.getLong(1) == testBySource(s), s"n_test for $s")
      assert(r.getLong(2) == badBySource.getOrElse(s, 0L), s"n_contaminated for $s")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), "clean + contaminated = test")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    assert(got.map(_.getString(0)).toSet == testBySource.keySet,
      "every source with test docs must appear")
  }

  test("cross-source near-dup matrix reconciles with the pair set") {
    val docs = Tables.documents(spark, sf001)
    val srcOf = docs.select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup
      .simhashNearDupPairsCapped(docs, maxHamming = 8, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent in-memory recompute of the matrix
    val keyed = pairs.map { case (d1, d2) =>
      val (a, b) = (srcOf(d1), srcOf(d2))
      ((if (a <= b) a else b, if (a <= b) b else a), (d1, d2))
    }
    val expPairs = keyed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expDocs = keyed.groupBy(_._1).view
      .mapValues(v => v.flatMap(p => Seq(p._2._1, p._2._2)).distinct.size.toLong)
      .toMap
    val got = Dedup.crossSourceNearDup(docs, maxHamming = 8).collect()
    assert(got.nonEmpty)
    assert(got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      == expPairs.map { case ((a, b), n) => (a, b) -> n })
    assert(got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
      == expDocs.map { case ((a, b), n) => (a, b) -> n })
    for (r <- got) {
      assert(r.getString(0) <= r.getString(1), "matrix must be upper-triangular")
      assert(r.getBoolean(4) == (r.getString(0) != r.getString(1)))
      assert(r.getLong(3) <= 2 * r.getLong(2), "docs bounded by 2·pairs")
    }
  }
}
