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
