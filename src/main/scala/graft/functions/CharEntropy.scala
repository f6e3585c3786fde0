package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-distribution statistics in ONE row-local pass:
  * `(n, n_distinct, entropy_bits)` over the document's CODE POINTS — the
  * Shannon-entropy quality signal `q_char_entropy` emits.
  *
  * Why an expression (round 8): the statistic is a pure function of one
  * document, but the declarative formulation exploded every character into
  * a (doc_id, char) row and shuffled the whole corpus's characters through
  * two hash aggregations. This walk keeps the query map-only: scan →
  * project → output sort.
  *
  * Determinism: counts are exact longs per code point; the entropy's
  * floating sum `Σ cnt·ln(cnt)` is accumulated in ASCENDING CODE POINT
  * order (a canonical order, unlike either engine's shuffle-dependent
  * aggregation order — all three land within ulps and the contract rounds
  * to 4 decimals, same tolerance the declarative form already relied on),
  * and the final round is HALF_UP, matching both engines' `round(x, 4)`.
  * Code points (not UTF-16 units) mirror the previous regexp-'.'
  * extraction and DuckDB's per-character split: astral-plane characters
  * count once.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_bits", DoubleType, nullable = false)))

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CharEntropyExpr.stats($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyExpr {

  /** Called from generated code. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val m = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = m.get(cp)
      m.put(cp, if (prev == null) 1L else prev + 1L)
      n += 1
      i += Character.charCount(cp)
    }
    var slc = 0.0
    val it = m.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      slc += c * math.log(c)
    }
    val bits =
      if (n == 0L) 0.0
      else java.math.BigDecimal.valueOf((math.log(n.toDouble) - slc / n) / math.log(2.0))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    InternalRow(n, m.size.toLong, bits)
  }

  def charEntropy(c: Column): Column =
    Bridge.column(CharEntropyExpr(Bridge.expression(c)))
}
