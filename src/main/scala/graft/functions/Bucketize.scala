package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `token(v) = clamp(#{b in bounds : b < v}, 0, bins-1)` via binary search
  * over a constant sorted boundary array — the Spark-native analog of
  * `torch.bucketize(v, boundaries) - 1` + clamp
  * (/root/reference/etl_benchmark.py:76-82).
  *
  * Closure convention (SURVEY §2A fine print 1) — the reference ships BOTH:
  *  - `rightClosed = true` (default): a value equal to a boundary goes to
  *    the LOWER bin (strict `b < v` count), matching
  *    `torch.bucketize(right=False) - 1` (etl_benchmark.py:79);
  *  - `rightClosed = false`: boundary-equal values go to the UPPER bin
  *    (`b <= v` count), matching the Numba kernel's `val < thresholds[i]`
  *    first-hit search (etl_benchmark_numba.py:47) and
  *    `ml.feature.Bucketizer`'s left-closed intervals.
  *
  * Why a custom Catalyst expression (SURVEY §7): the composable alternative
  * `size(filter(boundsLit, b -> v > b))` is a higher-order function that is
  * CodegenFallback — interpreted per row, allocating an array per value — and
  * measured ~40x slower at sf0.1. This expression participates in whole-stage
  * codegen: the generated Java is a tight branch-free-ish binary-search loop
  * over a referenced `double[]`, O(log bins) per value, zero allocation.
  *
  * Null -> null. NaN -> the TOP bin, `bins - 1` (round 12 — previously bin
  * 0, the accidental result of IEEE `<` never holding for NaN). NaN-last is
  * the np.digitize convention (NaN treated as larger than every boundary)
  * and, decisively, Spark's OWN sort/agg ordering — the engine's quantile
  * boundary paths (Tokenize.quantileBoundsSelect and friends, round 12)
  * rank NaN last, so the tokenizer must agree or a NaN-bearing column
  * would bucket its NaN opposite to where the boundary computation counted
  * them. The reference has no NaN policy (SURVEY §2A fine print); ours is
  * explicit, total, and property-tested (TokenizeSpec).
  */
case class BucketizeExpr(child: Expression, bounds: Seq[Double], bins: Int,
                         rightClosed: Boolean = true)
    extends UnaryExpression {

  private lazy val arr: Array[Double] = bounds.toArray

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bucketize"

  override def nullSafeEval(input: Any): Any =
    if (rightClosed) BucketizeExpr.search(arr, input.asInstanceOf[Double], bins)
    else BucketizeExpr.searchRightOpen(arr, input.asInstanceOf[Double], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", arr, "double[]")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    val cmp = if (rightClosed) "<" else "<="
    // NaN ranks last (class doc): count := all boundaries, clamped to the
    // top bin — the loop alone would leave lo = 0 (IEEE compares are false)
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |int $lo = 0;
         |int $hi = $b.length;
         |if ($v != $v) { $lo = $hi; } else {
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($b[$mid] $cmp $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |  }
         |}
         |${ev.value} = $lo > ${bins - 1} ? ${bins - 1} : $lo;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketizeExpr {
  /** lower_bound: #bounds strictly less than v, clamped to [0, bins-1]
    * (right-closed intervals: boundary-equal values take the lower bin).
    * NaN counts EVERY boundary as below it — NaN-last, class doc. */
  def search(bounds: Array[Double], v: Double, bins: Int): Int = {
    var lo = 0
    var hi = bounds.length
    if (v != v) lo = hi
    else while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo > bins - 1) bins - 1 else lo
  }

  /** upper_bound: #bounds <= v, clamped (right-open intervals: boundary-equal
    * values take the upper bin — the Numba kernel's convention). Same
    * NaN-last policy as [[search]]. */
  def searchRightOpen(bounds: Array[Double], v: Double, bins: Int): Int = {
    var lo = 0
    var hi = bounds.length
    if (v != v) lo = hi
    else while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    if (lo > bins - 1) bins - 1 else lo
  }

  /** Column-level API. `bounds` must be sorted ascending; caller must ensure
    * the child column is DoubleType (cast upstream). */
  def bucketize(c: Column, bounds: Seq[Double], bins: Int,
                rightClosed: Boolean = true): Column =
    Bridge.column(BucketizeExpr(Bridge.expression(c), bounds, bins, rightClosed))
}
