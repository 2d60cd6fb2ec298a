package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Longest consecutive same-token run of a string's whitespace tokens,
  * computed in ONE eval call per row — the compiled twin of
  * `TextAnalysis.maxRunCol(wsTokens(text))` (q178's statistic).
  *
  * Why compiled: the in-row `aggregate` fold is a higher-order function,
  * which Spark evaluates as an interpreted expression tree once per
  * ELEMENT (CodegenFallback) — and, measured in-repo, the generated
  * wrapper for the three-field struct fold was also the slowest codegen
  * COMPILE in the tree (7.4 s cold on q178's first run). This expression
  * is one virtual call per ROW with the tokenize/compare loop as plain
  * compiled Scala — the ShingleHash64 pattern. The fold and the
  * gaps-and-islands window formulations stay in TextAnalysis as the
  * semantic pins (RepetitionRunsSpec proves all three agree row for row).
  *
  * Tokenization parity: exactly `split(trim(text), "\\s+")` — Spark's
  * `trim` strips 0x20 ONLY (not \t/\n), and Spark's `split` carries
  * limit -1, so leading/trailing NON-SPACE whitespace yields empty edge
  * tokens and empty text yields one "" token (max run 1). Replicated
  * here via the same Java regex split the builtin bottoms out in.
  */
case class MaxTokenRun(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_token_run"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_token_run expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    // Spark trim: leading/trailing 0x20 only
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val tokens = MaxTokenRun.Ws.split(s.substring(lo, hi), -1)
    var prev: String = null
    var cur = 0
    var mx = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      cur = if (t == prev) cur + 1 else 1 // prev == null on the first token
      if (cur > mx) mx = cur
      prev = t
      i += 1
    }
    mx
  }

  override protected def withNewChildInternal(newChild: Expression): MaxTokenRun =
    copy(child = newChild)
}

object MaxTokenRun {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def apply(text: Column): Column =
    ColumnBridge.column(MaxTokenRun(ColumnBridge.expression(text)))
}
