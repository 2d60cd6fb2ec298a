// scratch scale-up synthesizer for sf-scaling measurements:
//   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sfbig 5"
// Builds a ~5x corpus from re-keyed copies of sf0.1 so TimeQ can measure
// how the heavy queries' wall-clock scales with data (README bench notes).
// Copies are PERTURBED, not cloned — a verbatim clone would make every
// document a 5-way near-duplicate and every embedding a cosine-1 twin,
// turning the measurement into the pathological-corpus case DedupScaleSpec
// already covers rather than a statistically-similar bigger corpus:
//  - document text gets a per-copy vowel rotation (translate), changing
//    most shingles/signatures while preserving length stats;
//  - embeddings get a per-copy cyclic rotation of the vector (norm kept,
//    directions decorrelated);
//  - keys shift by a per-copy offset so joins/groups see distinct ids and
//    per-key cardinalities stay flat (users/orders grow in COUNT, not in
//    per-key history — the realistic growth axis).
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sfbig"
    val copies = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-copy text mutation: rotate the 26-letter alphabet by k (a
    // Caesar substitution — changes essentially every shingle/signature
    // while preserving length and whitespace stats). The alphabet is the
    // wrap bound: at k = 26 the rotation is identity and that copy would
    // be a byte-identical clone of the base — exactly the mutual-near-dup
    // corpus this tool exists to avoid; refuse rather than mislead.
    // (Round 14 widened this from a 5-vowel rotation so a 25x corpus can
    // exist for the second scaling point; embeddings' cyclic rotation
    // wraps at the 64-dim width, far above any alphabet-legal k.)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    require(copies <= alpha.length,
      s"copies=$copies > ${alpha.length}: the alphabet rotation wraps to " +
        "identity and later copies become verbatim near-dup clones")
    def rot(s: String, k: Int): String =
      s.drop(k % s.length) + s.take(k % s.length)
    def unionCopies(base: DataFrame)(mut: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(k => mut(base, k)).reduce(_ unionAll _)

    val docs = graft.Tables.documents(spark, src)
    unionCopies(docs) { (d, k) =>
      d.withColumn("doc_id", col("doc_id") + lit(k * 100000000L))
        .withColumn("text",
          if (k == 0) col("text") else translate(col("text"), alpha, rot(alpha, k)))
    }.write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = graft.Tables.embeddings(spark, src)
    unionCopies(emb) { (e, k) =>
      e.withColumn("vec_id", col("vec_id") + lit(k * 100000000L))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${k + 1}, size(embedding)), " +
            s"slice(embedding, 1, $k))"))
    }.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // the star schema keeps REFERENTIAL INTEGRITY across copies: every
    // shifted FK has a matching shifted dimension row (dangling keys
    // would make join output NOT grow with data, distorting exactly the
    // scaling this tool measures), and part/supplier shift too so
    // per-key join fan-out stays flat — the growth axis is entity COUNT
    val custOff = 100000000L
    val orderOff = 1000000000L
    val partOff = 200000000L
    val suppOff = 300000000L
    unionCopies(graft.Tables.customer(spark, src)) { (c, k) =>
      c.withColumn("c_custkey", col("c_custkey") + lit(k * custOff))
    }.write.mode("overwrite").parquet(s"$dst/customer.parquet")
    unionCopies(graft.Tables.part(spark, src)) { (p, k) =>
      p.withColumn("p_partkey", col("p_partkey") + lit(k * partOff))
    }.write.mode("overwrite").parquet(s"$dst/part.parquet")
    unionCopies(graft.Tables.supplier(spark, src)) { (sp, k) =>
      sp.withColumn("s_suppkey", col("s_suppkey") + lit(k * suppOff))
    }.write.mode("overwrite").parquet(s"$dst/supplier.parquet")

    val orders = graft.Tables.orders(spark, src)
    unionCopies(orders) { (o, k) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(k * orderOff))
        .withColumn("o_custkey", col("o_custkey") + lit(k * custOff))
    }.write.mode("overwrite").parquet(s"$dst/orders.parquet")

    val li = graft.Tables.lineitem(spark, src)
    unionCopies(li) { (l, k) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(k * orderOff))
        .withColumn("l_partkey", col("l_partkey") + lit(k * partOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * suppOff))
    }.write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    val ev = graft.Tables.events(spark, src)
    unionCopies(ev) { (e, k) =>
      e.withColumn("event_id", col("event_id") + lit(k * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(k * 10000000L))
    }.write.mode("overwrite").parquet(s"$dst/events.parquet")

    graft.Tables.names.foreach { n =>
      val p = s"$dst/$n.parquet"
      if (!new java.io.File(p).exists())
        spark.read.parquet(s"$src/$n.parquet").write.mode("overwrite").parquet(p)
    }
    println(s"[scaleup] wrote ${copies}x $src -> $dst")
    spark.stop()
  }
}
