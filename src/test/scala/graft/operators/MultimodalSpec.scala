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
}
