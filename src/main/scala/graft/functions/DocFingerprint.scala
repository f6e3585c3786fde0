package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Min-md5 document fingerprint over word-5-gram shingles in ONE row-local
  * pass — MinHash with a single hash function, `q_doc_fingerprint`'s
  * rolling-window content signature.
  *
  * Why an expression (round 8): the fingerprint is a pure function of one
  * document, but the declarative form exploded every 5-gram into a
  * (doc_id, shingle) shuffle through a min(md5 hex) aggregation. The walk
  * keeps the query map-only.
  *
  * Semantics are exactly the declarative form's (and the oracle's): one
  * 5-gram per position 1..max(len-4, 1) joined with spaces (short docs
  * contribute their whole word list once), md5 per gram, minimum by HEX
  * STRING order — which equals unsigned byte order on the raw digests
  * (hex encoding is monotone per byte), so the walk compares 16 bytes and
  * hex-encodes only the winner. */
case class DocFingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_doc_fingerprint requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_doc_fingerprint"

  override def nullSafeEval(input: Any): Any =
    DocFingerprintExpr.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.DocFingerprintExpr.fingerprint($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DocFingerprintExpr {

  private val Space = UTF8String.fromString(" ")
  private val HexChars = "0123456789abcdef".toCharArray

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Called from generated code. */
  def fingerprint(ws: ArrayData): UTF8String = {
    val len = ws.numElements()
    val total = math.max(len - 4, 1)
    val digest = md5.get()
    var best: Array[Byte] = null
    var i = 0
    while (i < total) {
      val k = math.min(5, len - i)
      val parts = new Array[UTF8String](math.max(k, 0))
      var j = 0
      while (j < k) { parts(j) = ws.getUTF8String(i + j); j += 1 }
      val b = UTF8String.concatWs(Space, parts: _*).getBytes
      digest.update(b, 0, b.length)
      val d = digest.digest()
      if (best == null || lessUnsigned(d, best)) best = d
      i += 1
    }
    val hex = new Array[Char](32)
    var h = 0
    while (h < 16) {
      hex(2 * h) = HexChars((best(h) >> 4) & 0xf)
      hex(2 * h + 1) = HexChars(best(h) & 0xf)
      h += 1
    }
    UTF8String.fromString(new String(hex))
  }

  def docFingerprint(c: Column): Column =
    Bridge.column(DocFingerprintExpr(Bridge.expression(c)))
}
