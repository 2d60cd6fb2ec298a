package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit md5-derived token hashes in ONE eval call per row — the
  * compiled twin of `tokenHashesFromHex(md5TokenHex(c))` (word mode) and
  * of the q134 hex-window transform (chunk mode).
  *
  * Unlike [[ShingleHash64]] (XXH64 — internal join keys, never compared
  * across engines), these hashes feed [[SimHash64]] signatures that the
  * DuckDB oracle re-derives from md5 hex, so the hash function MUST stay
  * md5 and the value MUST equal the big-endian first 8 digest bytes —
  * exactly what the HOF composition's `conv(substring(hex,1,8)) << 32 |
  * conv(substring(hex,9,8))` parse produces. The composable form walks
  * the interpreted tree once per TOKEN (transform / element-wise md5 /
  * two convs are all CodegenFallback); this expression pays one virtual
  * call per ROW and runs the tokenize/digest loop as compiled Scala
  * (measured: the q134 signature stage dropped ~3×).
  *
  * Word mode (`chunkBytes = 0`, string input) replicates wsTokens
  * precisely: strip leading/trailing SPACE characters only (Spark `trim`
  * does not touch tabs/newlines), then Java-regex split on `\s+` with
  * limit -1 (Spark `split` keeps trailing empty tokens). Md5TokenHofSpec
  * pins bit-equality against the HOF composition on the real corpus and
  * on adversarial whitespace fixtures.
  *
  * Chunk mode (`chunkBytes = k > 0`, binary input) hashes each
  * non-overlapping k-byte chunk as the md5 of its UPPERCASE-hex
  * rendering (what `md5(substring(hex(blob), 8i+1, 8))` computes),
  * keeping the DuckDB twin's VARCHAR-md5 formulation valid. */
case class Md5TokenHash64(child: Expression, chunkBytes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_token_hash64"

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, chunkBytes) match {
    case (StringType, 0) => TypeCheckResult.TypeCheckSuccess
    case (BinaryType, k) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case (t, k) => TypeCheckResult.TypeCheckFailure(
      s"md5_token_hash64 expects (string, 0) or (binary, k>0), got (${t.simpleString}, $k)")
  }

  private val HexUpper = "0123456789ABCDEF".toCharArray

  private def digestToLong(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    if (chunkBytes == 0) {
      // Spark trim: spaces only, both ends
      val s0 = input.toString
      var b = 0; var e = s0.length
      while (b < e && s0.charAt(b) == ' ') b += 1
      while (e > b && s0.charAt(e - 1) == ' ') e -= 1
      val tokens = s0.substring(b, e).split("\\s+", -1)
      val out = new Array[Long](tokens.length)
      var i = 0
      while (i < tokens.length) {
        md.reset()
        out(i) = digestToLong(
          md.digest(tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val bytes = input.asInstanceOf[Array[Byte]]
      val n = bytes.length / chunkBytes
      val out = new Array[Long](n)
      val hexAscii = new Array[Byte](2 * chunkBytes)
      var c = 0
      while (c < n) {
        var j = 0
        while (j < chunkBytes) {
          val v = bytes(c * chunkBytes + j) & 0xff
          hexAscii(2 * j) = HexUpper(v >>> 4).toByte
          hexAscii(2 * j + 1) = HexUpper(v & 0xf).toByte
          j += 1
        }
        md.reset()
        out(c) = digestToLong(md.digest(hexAscii))
        c += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Md5TokenHash64 =
    copy(child = newChild)
}

object Md5TokenHash64 {
  /** md5 hash per whitespace token of a string column. */
  def words(text: Column): Column =
    ColumnBridge.column(Md5TokenHash64(ColumnBridge.expression(text), 0))

  /** md5 hash per non-overlapping k-byte chunk of a binary column. */
  def chunks(blob: Column, chunkBytes: Int): Column =
    ColumnBridge.column(Md5TokenHash64(ColumnBridge.expression(blob), chunkBytes))
}
