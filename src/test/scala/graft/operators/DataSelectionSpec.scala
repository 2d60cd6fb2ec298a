package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Specs for the data-selection / curation-accounting family added in
  * round 7: DSIR importance ranking (q111), semantic dedup (q112),
  * embedding outliers (q113), duplication-factor accounting (q114). */
class DataSelectionSpec extends SparkSpec {

  test("dsir: target-like docs outrank off-distribution docs on a skewed corpus") {
    import spark.implicits._
    // target source speaks only "alpha beta", one raw doc mimics it, one
    // raw doc is pure "gamma delta" — the mimic must rank first.
    val docs = Seq(
      (1L, "tgt", "alpha beta alpha beta alpha beta"),
      (2L, "tgt", "alpha alpha beta beta"),
      (3L, "raw", "alpha beta alpha beta"),
      (4L, "raw", "gamma delta gamma delta"),
      (5L, "raw", "alpha gamma beta delta"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.dsirImportanceTop(docs, "tgt", 10).collect()
    assert(got.length == 3, "every raw doc scored")
    assert(got.map(_.getLong(0)).toSeq == Seq(3L, 5L, 4L),
      "ranking must follow target-likeness: mimic > mixed > off-distribution")
    val scores = got.map(_.getDouble(3))
    assert(scores(0) > 0, "target-like doc carries positive avg log-ratio")
    assert(scores(2) < 0, "off-distribution doc carries negative avg log-ratio")
    assert(got.map(_.getInt(4)).toSeq == Seq(1, 2, 3), "rn is dense from 1")
  }

  test("dsir: target docs never appear, k bounds the output") {
    val top = Sampling.dsirImportanceTop(
      Tables.documents(spark, sf0001), "src0", 7).collect()
    assert(top.length == 7)
    assert(top.forall(_.getString(1) != "src0"), "target pool leaked into ranking")
    val s = top.map(_.getDouble(3))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b }, "not descending")
  }

  test("semantic dedup: two tight clusters keep exactly one survivor each") {
    import spark.implicits._
    // 64-dim: three near-copies along e0, three along e1; nlist=2 with
    // seeds = two lowest ids (both e0-ish) still converges to one
    // centroid per group after the Lloyd rounds? Not guaranteed — so use
    // vectors where the 2 seed ids straddle the groups: ids 0,1 are the
    // first two vectors; make id 0 e0-like and id 1 e1-like.
    def vec(hot: Int, scale: Float): Array[Float] = {
      val a = Array.fill(64)(0.001f)
      a(hot) = scale
      a
    }
    val rows = Seq(
      (0L, vec(0, 1.0f)), (1L, vec(1, 1.0f)),
      (2L, vec(0, 0.9f)), (3L, vec(1, 0.8f)),
      (4L, vec(0, 1.1f)), (5L, vec(1, 1.2f)))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, threshold = 0.99, nlist = 2, iters = 2)
      .collect()
    assert(got.map(_.getLong(1)).sum == 6, "partition sizes must sum to the corpus")
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), "n_vecs = dropped + kept")
      assert(r.getLong(3) == 1, s"each tight cluster keeps exactly one: $r")
    }
  }

  test("semantic dedup: impossible threshold drops nothing, looser drops more") {
    val e = Tables.embeddings(spark, sf0001)
    val none = Similarity.semanticDedup(e, threshold = 1.01).collect()
    assert(none.forall(_.getLong(2) == 0), "cosine cannot exceed 1")
    val total = none.map(_.getLong(1)).sum
    assert(total == e.count(), "every vector lands in exactly one cluster")
    val tight = Similarity.semanticDedup(e, threshold = 0.9).collect()
      .map(_.getLong(2)).sum
    val loose = Similarity.semanticDedup(e, threshold = 0.2).collect()
      .map(_.getLong(2)).sum
    assert(loose >= tight, "a looser threshold can only drop more")
  }

  test("embedding outliers: bounded per label, ascending cosine, valid range") {
    val got = SparkEntry.queries("q113_embedding_outliers")(spark, sf0001)
      .collect()
    val byLabel = got.groupBy(_.getInt(0))
    byLabel.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a <= b },
        "outliers must be the LOWEST cosines, ranked ascending")
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001), "cosine out of range")
    }
  }

  test("dup-cluster accounting: masses reconcile with the replicated corpus") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val third = docs.filter(col("doc_id") % 10 < 3).count()
    val got = SparkEntry.queries("q114_dup_cluster_sizes")(spark, sf0001)
      .collect()
    assert(got.map(r => r.getLong(1) * r.getLong(0)).sum == 2 * n + third,
      "n_clusters x size must cover the replicated corpus")
    assert(got.map(_.getLong(2)).sum == 2 * n + third, "n_docs column agrees")
    val totalChars = got.map(_.getLong(3)).sum
    got.foreach { r =>
      // identical text => identical n_chars, so removable = (sz-1)/sz of mass
      assert(r.getLong(4) * r.getLong(0) == r.getLong(3) * (r.getLong(0) - 1),
        s"removable mass must be (size-1)/size of the cluster mass: $r")
      assert(math.abs(r.getDouble(5) - r.getLong(4).toDouble / totalChars) < 1e-12,
        "removable_frac must be removable/corpus-total")
    }
  }
}
