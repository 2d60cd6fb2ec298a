package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic distributed sampling as a typed [[Aggregator]] — the
  * `Aggregator[IN, BUF, OUT]` surface of the engine (SURVEY §2.11: the
  * reference needs none; the extension surface uses it where built-ins
  * can't express the semantics).
  *
  * Bottom-k-by-hash is the mergeable form of uniform sampling: keep the
  * k elements with the smallest hash of a stable key. Because "smallest
  * k" is associative and commutative over set union, partial buffers
  * combine exactly like a partial aggregate (each map task ships at most
  * k elements), and the result is a uniform sample that is REPRODUCIBLE
  * across runs, cluster sizes, and engines — rand()-based sampling is
  * none of those. Used per group, this is balanced sampling (k docs per
  * source), which global TakeOrderedAndProject cannot express.
  *
  * IN is (groupKey, hashKey, id); the group key rides along unused so
  * the same element type works under `groupByKey`. The buffer is a
  * k-bounded sorted list — fine for the k this is for (per-group
  * samples); a big-k variant would swap in a bounded heap.
  */
final class BottomKIds(k: Int)
    extends Aggregator[(String, String, Long), List[(String, Long)], Seq[Long]] {

  private def trim(l: List[(String, Long)]): List[(String, Long)] =
    l.sorted.take(k)

  override def zero: List[(String, Long)] = Nil
  override def reduce(buf: List[(String, Long)], in: (String, String, Long)): List[(String, Long)] =
    trim((in._2, in._3) :: buf)
  override def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] =
    trim(a ++ b)
  override def finish(buf: List[(String, Long)]): Seq[Long] =
    buf.sorted.map(_._2)

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    Encoders.kryo[List[(String, Long)]]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** KMV (k-minimum-values) distinct-count sketch over md5 hex hashes —
  * the mergeable, ENGINE-PORTABLE alternative to HLL (q19): where HLL's
  * register layout is engine-specific and therefore un-oracle-able, KMV's
  * state is just the k lexicographically-smallest DISTINCT hashes, and
  * lowercase md5 hex order is identical everywhere, so the whole sketch —
  * state, merge, estimate — can be re-derived exactly in ANSI SQL (q74).
  *
  * Estimator: treating the k-th smallest hash as a uniform draw h_k in
  * [0,1) (first 8 hex chars / 2^32), distinct ≈ (k-1)/h_k. Below k
  * distinct values the sketch IS the exact answer. Standard error is
  * ~1/sqrt(k-2) (Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002).
  *
  * Merge is set-union-then-trim: associative, commutative, idempotent —
  * re-delivered rows cannot inflate the estimate (unlike a sum-based
  * counter), and each map task ships at most k 32-char strings per
  * group. The buffer is a sorted bounded list (same trade-off as
  * [[BottomKIds]]; a big-k production variant would swap in a TreeSet).
  *
  * IN is (groupKey, md5hex); the group key rides along unused so the
  * element type matches under `groupByKey`, exactly as in BottomKIds.
  * OUT is (k_used, estimate).
  */
final class KmvDistinct(k: Int)
    extends Aggregator[(String, String), List[String], (Int, Double)] {

  private def trim(l: List[String]): List[String] = l.distinct.sorted.take(k)

  override def zero: List[String] = Nil
  override def reduce(buf: List[String], in: (String, String)): List[String] =
    // fast reject: once the buffer is full (sorted, distinct), a hash >= the
    // current k-th smallest cannot enter the sketch — skip the O(k log k)
    // re-trim for the overwhelming majority of rows past warm-up
    if (buf.lengthCompare(k) >= 0 && in._2 >= buf.last) buf
    else trim(in._2 :: buf)
  override def merge(a: List[String], b: List[String]): List[String] =
    trim(a ++ b)
  override def finish(buf: List[String]): (Int, Double) =
    if (buf.size < k) (buf.size, buf.size.toDouble)
    else {
      // clamp: if the k-th hash's top 32 bits are all zero (possible, just
      // astronomically rare at k=256) a raw parse would make frac = 0.0 and
      // the estimate Infinity — floor the divisor at 1/2^32 instead (the
      // q74 twin mirrors this with GREATEST(..., 1))
      val frac = math.max(java.lang.Long.parseLong(buf.last.take(8), 16), 1L) / 4294967296.0
      (k, (k - 1).toDouble / frac)
    }

  override def bufferEncoder: Encoder[List[String]] = Encoders.kryo[List[String]]
  override def outputEncoder: Encoder[(Int, Double)] = ExpressionEncoder[(Int, Double)]()
}
