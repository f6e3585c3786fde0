package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[MinHashSigExpr]] against a plain-Scala re-derivation of the
  * declarative formulation the DuckDB oracle runs: distinct word-3-gram
  * shingles (short-document rule: < 3 words → one whole-list shingle),
  * per-shingle md5 hex halves as unsigned 32-bit v1/v2, and
  * sig_i = min (v1 + i·v2) mod 2^32. Skews toward repetition (duplicate
  * shingles must dedup before hashing — the min is unaffected, but the
  * walk's distinct-set bookkeeping is what the property pins). */
class MinHashSigSpec extends AnyFunSuite {

  private val Funcs = 16
  private val Mod = 4294967296L

  private def refSigs(ws: Seq[String]): Seq[Long] = {
    val md = MessageDigest.getInstance("MD5")
    val total = math.max(ws.length - 2, 1)
    val shingles = (0 until total).map(i => ws.slice(i, i + 3).mkString("|")).distinct
    val out = Array.fill(Funcs)(Long.MaxValue)
    for (s <- shingles) {
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val v1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val v2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      for (i <- 0 until Funcs)
        out(i) = math.min(out(i), (v1 + i * v2) % Mod)
    }
    out.toSeq
  }

  private def walk(ws: Seq[String]): Seq[Long] = {
    val arr = new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
    MinHashSigExpr.sigs(arr, Funcs).toLongArray().toSeq
  }

  private val genWords: Gen[List[String]] = for {
    vocabSize <- Gen.choose(1, 6)
    vocab <- Gen.listOfN(vocabSize, Gen.oneOf("a", "bb", "ccc", "", "naïve", "x1"))
    n <- Gen.choose(1, 50)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws

  test("walk sigs == declarative min-agg semantics on repetitive word lists") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1000),
      Prop.forAll(genWords)(ws => walk(ws) == refSigs(ws)))
    assert(res.passed, s"minhash-vs-ref: $res")
  }

  test("hand edges: 1 and 2 words, total repetition, empties") {
    val edges = Seq(
      Seq("a"), Seq("a", "b"), Seq("a", "b", "c"), Seq(""),
      Seq.fill(20)("same"), Seq("a", "", "b", "", "a", "", "b"))
    for (ws <- edges)
      assert(walk(ws) == refSigs(ws), s"input $ws")
  }

  test("identical word lists produce identical signatures") {
    assert(walk(Seq("p", "q", "r", "s")) == walk(Seq("p", "q", "r", "s")))
  }
}
