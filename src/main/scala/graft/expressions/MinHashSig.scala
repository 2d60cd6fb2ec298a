package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-element MinHash signature of a string's n-word shingle set, one eval
  * per row: element i is the lexicographic MIN of md5hex(s"$i|$shingle")
  * over all distinct shingles.
  *
  * The md5-over-string construction is deliberately engine-independent:
  * a SQL engine computing `min(md5(i || '|' || shingle))` over the same
  * shingles produces the identical signature, which is what makes the
  * LSH candidate query oracle-checkable. This expression replaces the
  * explode → crossJoin(seeds) → groupBy(min×k) plan with a compiled
  * per-row loop and NO shuffle at all for signature construction.
  */
case class MinHashSig(child: Expression, k: Int, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${t.simpleString}")
  }

  @transient private lazy val md5 = MessageDigest.getInstance("MD5")
  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = md5.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.toString.trim.split("\\s+")
    val shingles = new scala.collection.mutable.HashSet[String]
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      shingles.add(sb.toString)
      i += 1
    }
    val sig = new Array[Any](k)
    var s = 0
    while (s < k) {
      var best: String = null
      shingles.foreach { sh =>
        val h = md5Hex(s"$s|$sh")
        if (best == null || h < best) best = h
      }
      sig(s) = UTF8String.fromString(if (best == null) "" else best)
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(text: Column, k: Int = 8, n: Int = 3): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), k, n))
}
