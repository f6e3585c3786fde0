package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.BucketizeExpr

/** SparkSessionExtensions entry point: registers graft's custom expressions
  * for the SQL surface. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * SQL: `graft_bucketize(value, array(0.1, 0.5, ...), bins)` — boundaries
  * must be a foldable double-array literal (they are table statistics, not
  * per-row data; the same constraint torch.bucketize has on its boundary
  * tensor, /root/reference/etl_benchmark.py:76).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_bucketize"),
      new ExpressionInfo(classOf[BucketizeExpr].getName, "graft_bucketize"),
      (exprs: Seq[Expression]) => GraftExtensions.buildBucketize(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => GraftExtensions.buildDot(exprs)))
    e.injectFunction((
      new FunctionIdentifier("graft_bpe_merge"),
      new ExpressionInfo(classOf[graft.functions.BpeMergeExpr].getName, "graft_bpe_merge"),
      (exprs: Seq[Expression]) => GraftExtensions.buildBpeMerge(exprs)))
    GraftExtensions.byteWalkFunctions.foreach { case (name, build) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1, s"$name(col) expects 1 argument")
          build(exprs.head)
        }))
    }
  }
}

object GraftExtensions {

  /** The round-7/8 byte-walk family: one string (or words-array) column in,
    * one packed value out — each replaces a multi-pass declarative
    * formulation with a single codegen walk. */
  private[graft] val byteWalkFunctions: Seq[(String, Expression => Expression)] = Seq(
    "graft_simhash64" -> (graft.functions.SimHash64Expr(_)),
    "graft_normalize_text" -> (graft.functions.NormalizeTextExpr(_)),
    "graft_type_probe" -> (graft.functions.TypeProbeExpr(_)),
    "graft_rep_ngram_stats" -> (graft.functions.RepNgramStatsExpr(_)),
    "graft_char_entropy" -> (graft.functions.CharEntropyExpr(_)),
    "graft_shingles" -> (graft.functions.ShinglesExpr(_)),
    "graft_bpe_token_count" -> (graft.functions.BpeTokenCountExpr(_)))
  private[graft] def buildDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_dot(arrayA, arrayB) expects 2 arguments")
    graft.functions.DotProductExpr(exprs.head, exprs(1))
  }

  private[graft] def buildBpeMerge(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      "graft_bpe_merge(symbolsArray, leftLiteral, rightLiteral) expects 3 arguments")
    def strLit(e: Expression, name: String): String = e match {
      case f if f.foldable && f.dataType == org.apache.spark.sql.types.StringType =>
        val v = f.eval()
        if (v == null) throw new IllegalArgumentException(
          s"graft_bpe_merge $name must not be null")
        v.toString
      case other => throw new IllegalArgumentException(
        s"graft_bpe_merge $name must be a foldable string (the merge pair is a per-round constant), got $other")
    }
    graft.functions.BpeMergeExpr(exprs.head, strLit(exprs(1), "left"), strLit(exprs(2), "right"))
  }

  private[graft] def buildBucketize(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3 || exprs.length == 4,
      "graft_bucketize(value, boundsArrayLiteral, binsLiteral[, rightClosed]) expects 3-4 arguments")
    val bounds = exprs(1) match {
      case f if f.foldable && f.dataType.isInstanceOf[ArrayType] =>
        // SQL numeric array literals parse as decimal arrays under ANSI —
        // cast to double[] before folding
        org.apache.spark.sql.catalyst.expressions.Cast(f, ArrayType(DoubleType))
          .eval().asInstanceOf[ArrayData].toDoubleArray().toSeq
      case other =>
        throw new IllegalArgumentException(
          s"graft_bucketize bounds must be a foldable double array, got $other")
    }
    val bins = exprs(2) match {
      case Literal(v: Int, _) => v
      case f if f.foldable => f.eval().asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(s"bins must be a literal, got $other")
    }
    val rightClosed = if (exprs.length < 4) true else exprs(3) match {
      case Literal(v: Boolean, _) => v
      case f if f.foldable => f.eval().asInstanceOf[Boolean]
      case other => throw new IllegalArgumentException(s"rightClosed must be a literal, got $other")
    }
    BucketizeExpr(
      org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, DoubleType), bounds, bins,
      rightClosed)
  }
}
