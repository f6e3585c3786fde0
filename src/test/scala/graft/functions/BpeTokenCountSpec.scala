package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[BpeTokenCountExpr]] against the `java.util.regex` formulation it
  * replaced on `q_token_count_regex`'s hot path (and which the DuckDB
  * oracle still runs): count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]` matches.
  * Generator skews toward class transitions and includes multi-byte and
  * astral-plane code points (each non-ASCII code point is one
  * negated-class match, never two UTF-16 halves). */
class BpeTokenCountSpec extends AnyFunSuite {

  private val pattern = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")

  private def ref(text: String): Int = {
    val m = pattern.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private def walk(text: String): Int =
    BpeTokenCountExpr.count(UTF8String.fromString(text))

  test("walk == regex re-derivation on generated texts") {
    val gen = for {
      n <- Gen.choose(0, 200)
      cs <- Gen.listOfN(n, Gen.oneOf(
        'a', 'Z', '7', ' ', ' ', ',', '.', '-', '\n', '\t', 'ß', '好',
        'q', '0', '9', '_'))
      astral <- Gen.oneOf("", new String(Character.toChars(0x1F600)))
    } yield cs.mkString + astral
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000),
      Prop.forAll(gen)(t => walk(t) == ref(t)))
    assert(res.passed, s"count-vs-regex: $res")
  }

  test("pinned edges: runs, transitions, unicode, whitespace classes") {
    for (t <- Seq("", " ", "   ", "abc", "abc123", "a1b2", "hello, world!",
        "line\nbreak\ttab", "..!!", "ß好ß", "a ß 1", "🙂🙂", "a🙂b",
        "UPPER lower 007 --", " leading and trailing ")) {
      assert(walk(t) == ref(t), s"mismatch on ${t.replace("\n", "\\n")}")
    }
  }
}
