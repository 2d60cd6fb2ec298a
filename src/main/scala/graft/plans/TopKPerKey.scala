package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator per-key top-k: logical node + strategy + physical
  * operator, the full custom-operator stack.
  *
  * The built-in formulation (`row_number() OVER (PARTITION BY key ORDER
  * BY ord) <= k`) must SORT every key's entire row set before it can
  * discard all but k rows, and — worse at scale — ships every input row
  * through the shuffle to do so. This operator keeps a bounded heap of k
  * rows per key and runs in two phases like an aggregate:
  *
  *   - partial (before the exchange): each map task reduces its slice to
  *     at most k rows per key, so shuffle volume is min(|slice|, k·keys)
  *     rows per task instead of the whole input;
  *   - final (after hash-clustering on the key): heaps merge the
  *     partial winners; O(n log k) total, no sort, no sort spill.
  *
  * Memory bound per task: (#keys in task) × k rows — the same working
  * set a window sort holds for ONE key's rows is here the cap for the
  * whole task, because rows beyond k are dropped on arrival. For
  * correctness under ties the order should be a total order (include a
  * unique column last); otherwise which of the tied rows survives is
  * plan-dependent, exactly as with row_number.
  */
object TopKPerKey {

  /** Top-k rows per key. `order` is (column name, ascending) — e.g.
    * `Seq("revenue" -> false, "id" -> true)` for "highest revenue,
    * ties by id". Expressions are built as unresolved attributes (the
    * analyzer binds them), so no Column-API node leaks into the task
    * closure. Registers the planner strategy on the frame's session
    * (idempotent). */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    // check-then-append on a shared mutable field: synchronize on the session
    // so concurrent first calls can't register the strategy twice
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerKeyNode(k, keys.map(UnresolvedAttribute.quoted),
        sortOrder, df.queryExecution.analyzed))
  }
}

final case class TopKPerKeyNode(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      val partial = TopKPerKeyExec(k, keys, order, planLater(child), partial = true)
      TopKPerKeyExec(k, keys, order, partial, partial = false) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val (kLocal, keyExprs, orderExprs, childOutput) = (k, keys, order, child.output)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(orderExprs, childOutput)
      // max-heap on the sort order: the root is the WORST of the current
      // best k, so admission is one compare and eviction is O(log k)
      val heapOrd: Ordering[InternalRow] = ord.on(identity[InternalRow])
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < kLocal) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow](heapOrd)
            pq.enqueue(row.copy())
            heaps.update(key.copy(), pq)
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }
}
