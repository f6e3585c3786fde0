package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge round applied to a symbol sequence: every left-to-right
  * NON-OVERLAPPING occurrence of the adjacent pair (l, r) is replaced by the
  * fused symbol l+r — the `merge_word` step of byte-pair-encoding tokenizer
  * training (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units", §3.2).
  *
  * Greedy-scan semantics, identical to the DuckDB oracle's `list_reduce`
  * fold: the output's last symbol is compared against each incoming ORIGINAL
  * symbol; a just-fused symbol (l+r) can never re-match as the left of
  * another occurrence because r is non-empty — so the fold equals the
  * classic "resume scanning after the replacement" behavior (`a a a` with
  * pair (a,a) -> `aa a`, not `aa aa`).
  *
  * The pair is a per-round CONSTANT (the argmax of the distributed pair
  * count, collected driver-side like quantile boundaries), so the merge is a
  * map-only projection; codegen emits one static call per row and the
  * expression stays inside whole-stage codegen. Null array -> null; null
  * ELEMENTS pass through unchanged (a null symbol can never match either
  * side of the pair), and the output's containsNull mirrors the input's —
  * split() children stay tight (containsNull=false) while arbitrary SQL
  * callers keep a type-honest array. A non-array<string> first argument is
  * rejected at ANALYSIS time, not with a runtime ClassCastException.
  */
case class BpeMergeExpr(child: Expression, l: String, r: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_merge requires array<string> as its first argument, got ${other.catalogString}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "graft_bpe_merge"

  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)

  override def nullSafeEval(input: Any): Any =
    BpeMergeExpr.merge(input.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", lU, classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeR", rU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeMergeExpr.merge($v, $lRef, $rRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergeExpr {

  /** Greedy non-overlapping pair fusion; called from generated code. Null
    * elements are copied through untouched — getUTF8String on a null slot is
    * undefined for unsafe arrays, so the slot is checked first. */
  def merge(in: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = in.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val s = if (in.isNullAt(i)) null else in.getUTF8String(i)
      if (s != null && m > 0 && out(m - 1) == l && s == r) {
        out(m - 1) = UTF8String.concat(l, r)
      } else {
        out(m) = s
        m += 1
      }
      i += 1
    }
    if (m == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def mergePair(c: Column, l: String, r: String): Column =
    Bridge.column(BpeMergeExpr(Bridge.expression(c), l, r))
}
