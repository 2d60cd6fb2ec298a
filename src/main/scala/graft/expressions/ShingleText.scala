package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The n-word shingles of a string AS TEXT, distinct per row — the
  * emitting sibling of [[ShingleHash64]], for the operations whose
  * OUTPUT is the phrase itself (a boilerplate blacklist a curator can
  * read and act on) rather than an internal join key.
  *
  * Tokenization is byte-for-byte the ShingleHash64 loop
  * (`trim.split("\\s+")`, space-joined windows), so a phrase emitted
  * here is exactly the phrase whose hash the dedup family joins on —
  * the two representations can never disagree about what a shingle is.
  * Same CodegenFallback trade as the hash form: one virtual call per
  * ROW with the tokenize/window loop in compiled Scala, versus the
  * composable split/transform/concat_ws form that walks an interpreted
  * expression tree per ELEMENT (measured 6x slower on q100's shapes).
  */
case class ShingleText(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_text expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.toString.trim.split("\\s+")
    if (tokens.length < n) new GenericArrayData(Array.empty[AnyRef])
    else {
      val seen = new mutable.HashSet[String]
      val out = mutable.ArrayBuilder.make[AnyRef]
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
        val s = sb.toString
        if (seen.add(s)) out += UTF8String.fromString(s)
        i += 1
      }
      new GenericArrayData(out.result())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleText =
    copy(child = newChild)
}

object ShingleText {
  def apply(text: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleText(ColumnBridge.expression(text), n))
}
