package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in ONE row-local pass:
  * `[total_3grams, distinct_3grams, total_2grams, max_2gram_count]` over a
  * words array — the two Gopher repetition signals (Rae et al. 2021 §A1.1)
  * that `q_rep_ngram_filters` derives ratios from.
  *
  * Why an expression (round 8): the statistic is a pure function of one
  * document, but the explode formulation shuffled every 2-gram to a
  * (doc_id, gram) hash aggregation — ~40 M gram rows at the 100x probe
  * (17.0 s) — then joined the two halves back on doc_id. This walk keeps
  * the whole query map-only: scan → project → output sort, no explode, no
  * gram shuffle, no rejoin. Gram identity is EXACT (a per-row hash map of
  * the gram strings, no rolling-hash collisions), so the result stays
  * cell-identical to the DuckDB oracle's unnest/GROUP BY formulation.
  *
  * Gram semantics mirror [[graft.operators.QualityOps.ngrams]]: one gram
  * starting at every position 1..max(len-(n-1), 1) — a document with fewer
  * than n words contributes one short gram (the whole document), and grams
  * join words with a single space.
  */
case class RepNgramStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_ngram_stats requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_rep_ngram_stats"

  override def nullSafeEval(input: Any): Any =
    RepNgramStatsExpr.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RepNgramStatsExpr.stats($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepNgramStatsExpr {

  private val Space = UTF8String.fromString(" ")

  /** One (total, distinct-or-max) accounting pass for one n; called twice
    * per row. The map is sized for the worst case up front so a long
    * document never rehashes mid-walk. */
  private def pass(arr: ArrayData, len: Int, n: Int): (Int, Int, Int) = {
    val total = math.max(len - (n - 1), 1)
    val m = new java.util.HashMap[UTF8String, Integer](total * 2)
    var maxC = 0
    var i = 0
    while (i < total) {
      val k = math.min(n, len - i)
      val parts = new Array[UTF8String](math.max(k, 0))
      var j = 0
      while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(Space, parts: _*)
      val c = m.getOrDefault(g, 0) + 1
      m.put(g, c)
      if (c > maxC) maxC = c
      i += 1
    }
    (total, m.size, maxC)
  }

  /** `[total_3grams, distinct_3grams, total_2grams, max_2gram_count]`;
    * called from generated code. */
  def stats(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val (t3, d3, _) = pass(arr, len, 3)
    val (t2, _, m2) = pass(arr, len, 2)
    UnsafeArrayData.fromPrimitiveArray(Array(t3, d3, t2, m2))
  }

  def repNgramStats(c: Column): Column =
    Bridge.column(RepNgramStatsExpr(Bridge.expression(c)))
}
