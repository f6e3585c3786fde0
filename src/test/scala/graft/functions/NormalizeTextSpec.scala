package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** `q_text_normalize`'s semantic ground truth is the two-regex chain
  * (lower → strip [^a-z0-9 ] → collapse " +" → trim) — the DuckDB oracle
  * runs it verbatim. The Spark plan executes the single-pass byte walk
  * [[NormalizeTextExpr]] (round 8: the regex chain was 51.6 s at the 100x
  * probe; the walk removes the regex engine from the hot path entirely).
  * This spec holds the two formulations together on generated ASCII
  * corpora and a hand edge list, and pins the ONE documented divergence:
  * non-ASCII code points whose Unicode lowercase lands in ASCII (e.g.
  * U+212A KELVIN SIGN → 'k') survive the regex chain but are dropped by
  * the byte walk — irrelevant for the pure-ASCII driver corpus, asserted
  * here so the boundary is explicit rather than latent. */
class NormalizeTextSpec extends AnyFunSuite {

  /** Reference implementation: the oracle's regex semantics. */
  private def refNorm(s: String): String =
    s.toLowerCase
      .replaceAll("[^a-z0-9 ]", "")
      .replaceAll(" +", " ")
      .trim

  private def walk(s: String): String =
    NormalizeTextExpr.normalize(UTF8String.fromString(s)).toString

  private val genAsciiText: Gen[String] = for {
    words <- Gen.listOfN(8, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(10)),
      Gen.asciiPrintableStr.map(_.take(12)),
      Gen.oneOf("", " ", "  ", "...", "a.b", "A B", "42", "x-y_z", "\t", "#!")))
    sep <- Gen.oneOf(" ", "  ", "   ", ". ", " .")
  } yield words.mkString(sep)

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, s"$name: $res")
  }

  test("byte walk == oracle regex chain on generated ASCII text") {
    check("normalize-vs-regex")(Prop.forAll(genAsciiText) { s =>
      walk(s) == refNorm(s)
    })
  }

  test("hand edge list: runs, boundaries, case, empties") {
    val edges = Seq(
      "", " ", "   ", ".", " . ", "..a..", "a", "A", " a ", "a  b", "a . b",
      "a\tb", "a\nb", "A.B.C", "  Hello,   WORLD!  42  ", "0", "00 11",
      "a-b-c", "éé", "é a é", "one  two   three", ".leading", "trailing.",
      "!@#$%^&*()", "MiXeD CaSe 123")
    for (s <- edges) assert(walk(s) == refNorm(s), s"input <$s>")
  }

  test("documented divergence: ASCII-lowercasing non-ASCII code points") {
    // U+212A KELVIN SIGN: Java lower() maps it to ASCII 'k', so the regex
    // chain keeps it; the byte walk drops the original bytes. The spec
    // asserts the divergence exists exactly as documented (not equality).
    val kelvin = "\u212A"
    assert(refNorm(kelvin) == "k")
    assert(walk(kelvin) == "")
  }
}
