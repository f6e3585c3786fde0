package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Byte-lane feature vector over a binary payload: lane j accumulates every
  * byte at position p with p % dim == j, normalized to [0, ~len/dim] by one
  * division by 255 — the deterministic stand-in "codec" for the multimodal
  * pipeline (a real image/audio decoder is not in this container; this
  * expression keeps the Spark-side plumbing — binary column in, fixed-width
  * vector out, map-only plan — identical to what a real decode expression
  * would look like).
  *
  * Cross-engine determinism: lane sums are accumulated as LONGS (exact,
  * order-independent) and divided once, so the doubles are bit-identical to
  * any engine that sums the same bytes — which is what makes
  * `q_multimodal_features` hash-checkable against DuckDB, where the round-4
  * feature sum is reproduced with hex-pair byte extraction.
  *
  * Codegen: one static call per row, inside whole-stage codegen — the
  * round-4 verdict replaced an RDD mapPartitions stage (boxed Rows, plan
  * break) with this expression.
  */
case class ByteFeaturesExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_features requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_byte_features"

  override def nullSafeEval(input: Any): Any =
    ByteFeaturesExpr.features(input.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ByteFeaturesExpr.features($v, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteFeaturesExpr {

  /** Exact long lane sums, one divide per lane; called from generated code. */
  def features(payload: Array[Byte], dim: Int): ArrayData = {
    val sums = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      sums(i % dim) += (payload(i) & 0xff).toLong
      i += 1
    }
    val out = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      out(j) = sums(j) / 255.0
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def byteFeatures(c: Column, dim: Int): Column =
    Bridge.column(ByteFeaturesExpr(Bridge.expression(c), dim))
}
