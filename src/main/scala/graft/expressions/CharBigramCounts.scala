package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-bigram counts: array<struct<g: string, c: long>> of
  * every adjacent code-point pair in the text with its in-row count
  * (first-appearance order).
  *
  * Why a custom Expression (the ShingleHash64 rationale at char level):
  * the composable form `explode(transform(sequence(1, len-1), i ->
  * substr(text, i, 2)))` walks the interpreted expression tree once per
  * CHARACTER — higher-order lambdas are CodegenFallback — and then
  * explodes one row per character into the partial aggregate. This
  * expression runs the whole count loop as compiled Scala in one virtual
  * call per ROW and emits one entry per DISTINCT in-row bigram (bounded
  * by min(text length, charset²)), so the downstream explode and partial
  * aggregation touch orders of magnitude fewer rows. q122 measured
  * 2.5 s → ~0.8 s at sf0.1 from this swap.
  *
  * Bigrams are CODE-POINT pairs (`new String(cps, j, 2)`), matching the
  * code-point semantics of Spark's `substr` and DuckDB's `substr` that
  * the q122 oracle counts with — identical grouping keys and counts on
  * both engines, including for supplementary-plane characters.
  */
case class CharBigramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "char_bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.toString.codePoints().toArray
    if (cps.length < 2) new GenericArrayData(Array.empty[Any])
    else {
      // LinkedHashMap: deterministic first-seen output order (the values
      // feed an order-insensitive sum, but determinism keeps row-level
      // tests and cached plans byte-stable)
      val counts = new java.util.LinkedHashMap[String, java.lang.Long](64)
      var j = 0
      while (j < cps.length - 1) {
        val g = new String(cps, j, 2)
        val prev = counts.get(g)
        counts.put(g, if (prev == null) 1L else prev + 1L)
        j += 1
      }
      val out = new Array[Any](counts.size)
      val it = counts.entrySet().iterator()
      var k = 0
      while (it.hasNext) {
        val e = it.next()
        out(k) = InternalRow(UTF8String.fromString(e.getKey), e.getValue.longValue())
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramCounts =
    copy(child = newChild)
}

object CharBigramCounts {
  def apply(text: Column): Column =
    ColumnBridge.column(CharBigramCounts(ColumnBridge.expression(text)))
}
