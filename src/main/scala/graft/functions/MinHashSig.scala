package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document's word array in ONE row-local pass —
  * the per-doc signature the LSH banding family (`q_dedup_minhash_lsh`,
  * jaccard/containment candidates, dedup clusters, the corpus funnel)
  * builds candidates from.
  *
  * Why an expression (round 8): the signature is a pure function of one
  * document, but the declarative formulation exploded every (doc, shingle)
  * row through an md5-hex string round-trip and shuffled them into a
  * 16-column min aggregation. This walk keeps signature computation
  * map-only; the BANDED candidate equi-join downstream is unchanged.
  *
  * Semantics are EXACTLY the declarative formulation's (and the DuckDB
  * oracle's, which still computes it the slow way): shingles are DISTINCT
  * word-3-grams joined with '|', one starting at every position
  * 1..max(len-2, 1) (a document with < 3 words contributes its whole word
  * list as one short shingle); per shingle, md5 hex chars 1-8 are a
  * big-endian unsigned 32-bit `v1`, chars 9-16 `v2`; and
  * `sig_i = min over shingles of (v1 + i·v2) mod 2^32` for i < funcs.
  */
case class MinHashSigExpr(child: Expression, funcs: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sigs requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.sigs(input.asInstanceOf[ArrayData], funcs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MinHashSigExpr.sigs($v, $funcs);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {

  private val Mod = 4294967296L // 2^32
  private val Pipe = UTF8String.fromString("|")

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from generated code: shingle → distinct → md5 halves → 16 mins. */
  def sigs(ws: ArrayData, funcs: Int): ArrayData = {
    val len = ws.numElements()
    val total = math.max(len - 2, 1)
    val seen = new java.util.HashSet[UTF8String](total * 2)
    val out = Array.fill(funcs)(Long.MaxValue)
    val digest = md5.get()
    val buf = new Array[Byte](16)
    var i = 0
    while (i < total) {
      val k = math.min(3, len - i)
      val parts = new Array[UTF8String](math.max(k, 0))
      var j = 0
      while (j < k) { parts(j) = ws.getUTF8String(i + j); j += 1 }
      val g = UTF8String.concatWs(Pipe, parts: _*)
      if (seen.add(g)) {
        val b = g.getBytes
        digest.update(b, 0, b.length)
        digest.digest(buf, 0, 16)
        val v1 = ((buf(0) & 0xffL) << 24) | ((buf(1) & 0xffL) << 16) |
          ((buf(2) & 0xffL) << 8) | (buf(3) & 0xffL)
        val v2 = ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
          ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)
        var f = 0
        while (f < funcs) {
          val h = (v1 + f * v2) % Mod
          if (h < out(f)) out(f) = h
          f += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def minhashSigs(c: Column, funcs: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(c), funcs))
}
