package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE-ish regex tokens — `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` — in
  * ONE row-local byte walk, replacing
  * `size(regexp_extract_all(text, ...))` on `q_token_count_regex`'s hot
  * path (round 9): the declarative form MATERIALIZES every token as its
  * own string just to take the array's length — hundreds of short-lived
  * allocations per document, and the 100x probe measured the query
  * super-linear (ratio 22.9, 10.5 s — GC pressure, not scan cost) where
  * every sibling text signal ran ≤ 8 after its round-8 walk.
  *
  * Exact regex semantics, derived from how `Matcher.find` scans: at each
  * position the alternation tries the letter run, then the digit run,
  * then the single non-(alphanumeric/space) CODE POINT; a space matches
  * nothing and is skipped. The classes are pure ASCII, so the walk
  * classifies single bytes; any byte >= 0x80 starts a multi-byte code
  * point — one "other" token, stepped by skipping UTF-8 continuation
  * bytes (10xxxxxx), which mirrors the regex engine's per-code-point
  * negated-class match (astral plane included). Property-held equal to a
  * `java.util.regex` re-derivation in BpeTokenCountSpec; the DuckDB
  * oracle keeps the regexp formulation (same ASCII classes in RE2).
  * Reference semantics: `q_token_count_regex`
  * (etl_benchmark.py:38-41-style per-column signal family).
  */
case class BpeTokenCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_token_count requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeTokenCountExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeTokenCountExpr.count($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCountExpr {

  private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Called from generated code. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var tokens = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isLetter(b)) {
        tokens += 1
        i += 1
        while (i < n && isLetter(s.getByte(i))) i += 1
      } else if (isDigit(b)) {
        tokens += 1
        i += 1
        while (i < n && isDigit(s.getByte(i))) i += 1
      } else if (b == ' ') {
        i += 1
      } else {
        // one non-(ASCII-alphanumeric/space) code point = one token;
        // step past any UTF-8 continuation bytes (10xxxxxx)
        tokens += 1
        i += 1
        while (i < n && (s.getByte(i) & 0xC0) == 0x80) i += 1
      }
    }
    tokens
  }

  def bpeTokenCount(c: Column): Column =
    Bridge.column(BpeTokenCountExpr(Bridge.expression(c)))
}
