package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word-3-gram shingles of a words array in ONE row-local pass —
  * the shared shingle builder behind the Jaccard/containment verify joins
  * and benchmark decontamination.
  *
  * Why an expression (round 8): the declarative form was
  * `array_distinct(transform(sequence(...), i -> concat_ws('|',
  * slice(w, i, 3))))` — higher-order functions are INTERPRETED (no
  * codegen, no subexpression elimination), so every row paid a boxed
  * lambda evaluation per shingle plus a second dedup pass. This walk
  * builds the distinct list in one loop inside whole-stage codegen.
  *
  * Semantics are exactly the declarative form's (and the DuckDB oracle's
  * `list_distinct(list_transform(...))`): one shingle starting at every
  * position 1..max(len-2, 1) (a document with < 3 words contributes its
  * whole word list as one short shingle), words joined with '|',
  * duplicates dropped keeping FIRST occurrence order — `array_distinct`'s
  * order, which keeps any downstream explode/intersect bit-compatible.
  */
case class ShinglesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShinglesExpr.shingles($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {

  private val Pipe = UTF8String.fromString("|")

  /** Called from generated code: first-occurrence-ordered distinct grams. */
  def shingles(ws: ArrayData): ArrayData = {
    val len = ws.numElements()
    val total = math.max(len - 2, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](total * 2)
    var i = 0
    while (i < total) {
      val k = math.min(3, len - i)
      val parts = new Array[UTF8String](math.max(k, 0))
      var j = 0
      while (j < k) { parts(j) = ws.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Pipe, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def shinglesOf(c: Column): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(c)))
}
