package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar 2002) of a space-delimited document in ONE
  * row-local byte walk — the signature `q_dedup_simhash` pigeonhole-bands
  * into candidate pairs.
  *
  * Why an expression (round 8): the signature is a pure function of one
  * document, but the declarative formulation exploded every word, md5'd it
  * through a hex-string round-trip (`conv(substring(md5(w), …), 16, 10)`),
  * and shuffled every (doc, word) row into a 64-column vote aggregation —
  * the whole per-doc reduction ran as a cluster-wide hash aggregate. This
  * walk keeps the signature map-only: scan → project(simhash) → 8-row
  * segment explode → banded equi-join. Nothing about the BANDING changes —
  * candidate generation stays the O(matches) pigeonhole equi-join.
  *
  * Bit semantics are EXACTLY the declarative formulation's (and the DuckDB
  * oracle's, which still computes it the slow way): words =
  * `split(text, " ")` with empties kept (consecutive / leading / trailing
  * spaces vote too, and an empty document is one empty word — every doc
  * has >= 1 word); per word, md5 hex chars 1-8 are a big-endian unsigned
  * 32-bit `h_hi`, chars 9-16 `h_lo`; simhash bit b reads `h_lo` bit b for
  * b < 32 and `h_hi` bit b-32 otherwise, votes +1/-1, final bit set iff
  * the vote sum is strictly positive. Splitting bytes on 0x20 is safe in
  * UTF-8 (a space byte never occurs inside a multi-byte sequence), and
  * md5 of the word's UTF-8 bytes is what both engines' `md5(word)` hash.
  *
  * Reference semantics: near-dup detection family, SURVEY.md §2C; cited at
  * `qDedupSimhash` (Dedup.scala).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SimHash64Expr.simhash($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {

  // MessageDigest is stateful; one per thread, reset per word by digest().
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Called from generated code: one pass over the document's bytes. */
  def simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    val digest = md5.get()
    val out = new Array[Byte](16)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        digest.update(bytes, start, i - start)
        digest.digest(out, 0, 16)
        // hex chars 1-8 = digest bytes 0-3 big-endian; chars 9-16 = bytes 4-7
        val hHi = ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
          ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
        val hLo = ((out(4) & 0xffL) << 24) | ((out(5) & 0xffL) << 16) |
          ((out(6) & 0xffL) << 8) | (out(7) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (((hLo >>> b) & 1L).toInt << 1) - 1
          votes(b + 32) += (((hHi >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) h |= 1L << b
      b += 1
    }
    h
  }

  def simhash64(c: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(c)))
}
