package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder: for each of M subspaces, the index of the
  * nearest codebook centroid (squared L2, ties to the lower index) — the
  * `encode` half of PQ ANN (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search").
  *
  * Why a custom expression: the column-algebra formulation (array of M
  * struct-greatest argmins over K distance subtrees) expands to M·K·subDim
  * expression nodes — ~12k for the 16x64x4 geometry — which overflows the
  * JVM's 64 KB method limit, kicks the whole stage out of codegen, and ran
  * ~40x slower interpreted. Here the codebook is ONE referenced
  * `double[][][]` and codegen emits a single static call wrapping three
  * tight loops (M·K·subDim ≈ 4k fused multiply-adds per row, no
  * allocation beyond the M-int result); the expression stays inside
  * whole-stage codegen.
  *
  * Input: float embedding of exactly M · subDim dims (enforced by require).
  * Null embedding -> null code.
  */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.encode(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqEncodeExpr.encode($v, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {

  /** Nearest-centroid index per subspace; called from generated code. */
  def encode(emb: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val sub = cb(0)(0).length
    require(emb.numElements() == m * sub,
      s"pq_encode: embedding has ${emb.numElements()} dims, codebook expects ${m * sub}")
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val cents = cb(mi)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d2 = 0.0
        var d = 0
        while (d < sub) {
          val t = emb.getFloat(mi * sub + d).toDouble - c(d)
          d2 += t * t
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      out(mi) = best
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def encodeCol(c: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(c), cb))
}
