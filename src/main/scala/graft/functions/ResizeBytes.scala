package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Fixed-width RESIZE (average pooling) of a binary payload — the
  * 1-D form of an image thumbnail: the byte stream is split into `outLen`
  * contiguous blocks with floor boundaries (block r covers
  * [r·n/outLen, (r+1)·n/outLen)) and each block contributes its mean byte
  * value. This is the "resize" stage of the multimodal mandate
  * (decode / feature-extract / RESIZE / frame-sample): a real image
  * resize averages pixel blocks exactly like this, with the decode stubbed
  * per the container contract (no codecs here), and the Spark-side shape —
  * binary in, fixed-width vector out, map-only inside whole-stage
  * codegen — is identical to what the real kernel would use.
  *
  * Cross-engine determinism: block sums are exact LONGS divided once by
  * the block length, so the doubles are bit-identical to DuckDB's
  * hex-pair re-derivation. Payloads shorter than `outLen` leave their
  * empty trailing blocks at 0.0 (floor boundaries collapse, hi == lo) —
  * the same zero-pad a thumbnail of a tiny image gets.
  */
case class ResizeBytesExpr(child: Expression, outLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // outLen < 1 would only fail at EXECUTION time (0 divides by zero in
    // resize, negative throws NegativeArraySizeException) — reject at
    // analysis so misuse of the public constructor fails at plan time
    case BinaryType if outLen < 1 => TypeCheckResult.TypeCheckFailure(
      s"graft_resize_bytes requires outLen >= 1, got $outLen")
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_resize_bytes requires binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_resize_bytes"

  override def nullSafeEval(input: Any): Any =
    ResizeBytesExpr.resize(input.asInstanceOf[Array[Byte]], outLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ResizeBytesExpr.resize($v, $outLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ResizeBytesExpr {

  /** Exact long block sums, one divide per block; called from generated
    * code. Floor block boundaries: lo_r = r*n/outLen (long arithmetic —
    * no overflow for any real payload). */
  def resize(payload: Array[Byte], outLen: Int): ArrayData = {
    val n = payload.length.toLong
    val out = new Array[Double](outLen)
    var r = 0
    while (r < outLen) {
      val lo = (r * n / outLen).toInt
      val hi = ((r + 1) * n / outLen).toInt
      if (hi > lo) {
        var s = 0L
        var i = lo
        while (i < hi) { s += (payload(i) & 0xff).toLong; i += 1 }
        out(r) = s.toDouble / (hi - lo)
      }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def resizeBytes(c: Column, outLen: Int): Column =
    Bridge.column(ResizeBytesExpr(Bridge.expression(c), outLen))
}
