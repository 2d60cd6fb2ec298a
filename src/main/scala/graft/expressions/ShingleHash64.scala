package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** 64-bit hashes of all n-word shingles of a string, computed in ONE
  * eval call per row — DISTINCT hashes by default (the inverted-index
  * contract), or every positional hash with `distinct = false` (the
  * frequency-counting contract, e.g. q101's top-bigram share).
  *
  * The composable form (split → transform → concat_ws → array_distinct →
  * xxhash64-per-element) walks the interpreted expression tree once per
  * ELEMENT — higher-order functions are CodegenFallback in Spark — which
  * dominated the n-gram dedup queries at bench scale. This expression is
  * also CodegenFallback, but that costs one virtual call per ROW; the
  * whole tokenize/window/hash loop runs as compiled Scala.
  *
  * Hashes are XXH64 (seed 42, Spark's own) over the UTF-8 bytes of the
  * space-joined shingle. The hash values are internal join/group keys —
  * callers never compare them across engines.
  */
case class ShingleHash64(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.toString.trim.split("\\s+")
    if (tokens.length < n) new GenericArrayData(Array.empty[Long])
    else {
      val seen = new mutable.LongMap[Unit](tokens.length)
      val out = mutable.ArrayBuilder.make[Long]
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(tokens(i + k))
          k += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        if (!distinct) out += h
        else if (!seen.contains(h)) { seen.update(h, ()); out += h }
        i += 1
      }
      new GenericArrayData(out.result())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64 {
  def apply(text: Column, n: Int = 3): Column =
    ColumnBridge.column(
      ShingleHash64(ColumnBridge.expression(text), n, distinct = true))

  /** Every positional shingle hash (repeats kept) — for frequency work. */
  def all(text: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleHash64(ColumnBridge.expression(text), n, distinct = false))
}
