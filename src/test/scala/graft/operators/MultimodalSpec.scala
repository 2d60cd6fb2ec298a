package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("assets carry the payload bytes and typed metadata") {
    val a = Multimodal.assets(docs)
    val row = a.filter(_.doc_id == 0L).head()
    assert(row.blob.nonEmpty && row.mime.nonEmpty)
    val expected = docs.filter(col("doc_id") === 0L)
      .select("text").head().getString(0)
    assert(new String(row.blob, "UTF-8") == expected, "blob must round-trip the payload")
  }

  test("feature extraction is deterministic and total") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(docs)).collect()
      .map(f => f.doc_id -> f).toMap
    val f2 = Multimodal.extractFeatures(
      Multimodal.assets(docs.repartition(9))).collect()
    assert(f2.length == docs.count())
    f2.foreach { f =>
      val g = f1(f.doc_id)
      assert(f.n_bytes == g.n_bytes && f.mean_byte == g.mean_byte &&
        f.byte_entropy == g.byte_entropy)
      assert(f.byte_entropy > 0 && f.byte_entropy <= 8.0)
      assert(f.mean_byte > 0 && f.mean_byte < 256)
    }
  }

  test("resize downsamples payloads to the target size, idempotent on small blobs") {
    val a = Multimodal.assets(docs)
    val resized = Multimodal.resize(a, targetBytes = 64).collect()
    assert(resized.forall(_.blob.length <= 64))
    // resizing an already-small blob is identity
    val tiny = Multimodal.resize(Multimodal.resize(a, 64), 64).collect()
      .map(x => x.doc_id -> x.blob.toSeq).toMap
    resized.foreach(r => assert(tiny(r.doc_id) == r.blob.toSeq))
  }

  test("frame sampling yields k slices of the requested size") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assets(docs).toDF(), k = 4, frameBytes = 16)
    val r = frames.select(col("doc_id"), size(col("frames")).as("k"),
        expr("transform(frames, f -> length(f))").as("lens"))
      .collect()
    assert(r.forall(_.getInt(1) == 4))
    assert(r.forall(_.getSeq[Int](2).forall(_ == 16)))
  }

  test("cross-modal pairs: total on the key intersection, flags cohere") {
    val got = Multimodal.crossModalPairs(docs, Tables.embeddings(spark, sf0001))
      .collect()
    assert(got.length == docs.count(), "1:1 key overlap must yield one pair per doc")
    got.foreach { r =>
      val ok = r.getAs[Boolean]("pair_ok")
      val flags = Seq("f_caption_short", "f_payload_small", "f_norm_out")
        .map(r.getAs[Boolean])
      assert(ok == !flags.exists(identity), "pair_ok must be the flag conjunction")
      // unit-normalized corpus: norms sit within 1e-6 of 1.0
      assert(math.abs(r.getAs[Double]("vec_norm") - 1.0) < 1e-6)
    }
  }

  test("mimeOf partitions the corpus into exactly three modalities") {
    val m = docs.select(Multimodal.mimeOf(col("doc_id")).as("mime"))
      .groupBy("mime").count().collect()
    assert(m.map(_.getString(0)).toSet ==
      Set("image/jpeg", "audio/wav", "video/mp4"))
    assert(m.map(_.getLong(1)).sum == docs.count())
  }

  test("payload near-dup: shared-prefix payloads pair up, disjoint ones do not") {
    val spark0 = spark
    import spark0.implicits._
    // two docs sharing a long byte prefix with a divergent tail (the
    // template shape q134 is designed for), plus an unrelated doc
    val prefix = ("alpha bravo charlie delta echo foxtrot golf hotel " * 8)
    val fixture = Seq(
      (1L, prefix + "tail one"),
      (2L, prefix + "tail two entirely"),
      (3L, "completely different content with no shared bytes at all " * 8))
      .toDF("doc_id", "text")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("blob"))
    val pairs = Multimodal.payloadSimhashPairs(fixture, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "shared-prefix payloads must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated payload must not pair")
  }

  test("frame near-dup: shared-prefix payloads match on frame 0, disjoint never match") {
    val spark0 = spark
    import spark0.implicits._
    val prefix = "shared sixteen b" // exactly 16 bytes — frame 0 for both
    val fixture = Seq(
      (1L, prefix + (" tail one " * 20)),
      (2L, prefix + (" a different continuation " * 12)),
      (3L, "completely unrelated payload body with other bytes " * 8))
      .toDF("doc_id", "text")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("blob"))
    val got = Multimodal.frameNearDupPairs(fixture)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 2L)), "same first frame must produce a pair")
    assert(got((1L, 2L)) >= 1L)
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated payload must not pair")
  }

  test("frame near-dup: identical payloads share all distinct frames") {
    val spark0 = spark
    import spark0.implicits._
    val body = "frame dedup body with enough bytes to sample four windows " * 4
    val fixture = Seq((1L, body), (2L, body))
      .toDF("doc_id", "text")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("blob"))
    val got = Multimodal.frameNearDupPairs(fixture).collect()
    assert(got.length == 1)
    // 4 sampled frames, all distinct for this body → n_shared == 4
    assert(got.head.getLong(2) == 4L, s"expected 4 shared frames: ${got.head}")
  }

  test("payload near-dup: sub-4-byte payloads are excluded, not crashed on") {
    val spark0 = spark
    import spark0.implicits._
    val fixture = Seq((1L, "ab"), (2L, "abcdefgh" * 10), (3L, "abcdefgh" * 10))
      .toDF("doc_id", "text")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("blob"))
    val pairs = Multimodal.payloadSimhashPairs(fixture, maxHamming = 8).collect()
    assert(pairs.forall(r => r.getLong(0) != 1L && r.getLong(1) != 1L))
    assert(pairs.exists(r => r.getLong(0) == 2L && r.getLong(1) == 3L),
      "identical payloads must pair at hamming 0")
  }
}
