package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two numeric arrays, accumulated left-to-right in
  * double — identical fp semantics to the composable
  * `aggregate(zip_with(a, b, (x,y) => x.cast*y.cast), 0.0, _+_)` (which is
  * CodegenFallback: interpreted, two intermediate arrays per row). On a
  * 100 TB embedding scan the dot product IS the inner loop — this keeps it
  * a tight branch-free fused loop inside whole-stage codegen, zero
  * allocation.
  *
  * Null arrays -> null; null ELEMENTS are treated as 0 (the driver corpus
  * has none; the HOF formulation would instead null the whole sum).
  * Unequal lengths: the shorter length wins (zip semantics).
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"graft_dot needs float/double arrays, got $t")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (isFloat(left)) "getFloat" else "getDouble"
    val ra = if (isFloat(right)) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val sum = ctx.freshName("sum")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.$la($i) * (double) $b.$ra($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
}
