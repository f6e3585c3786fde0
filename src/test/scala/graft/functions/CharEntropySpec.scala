package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[CharEntropyExpr]] against a plain-Scala re-derivation of the explode
  * formulation the DuckDB oracle still runs: per-code-point counts,
  * Shannon entropy in bits, HALF_UP round-4. Skews toward repetition and
  * includes multi-byte + astral-plane code points (counted once, like the
  * regexp-'.' extraction the walk replaced). */
class CharEntropySpec extends AnyFunSuite {

  private def ref(text: String): (Long, Long, Double) = {
    val cps = text.codePoints().toArray
    val byCp = cps.groupBy(identity).map { case (cp, v) => (cp, v.length.toLong) }
    val n = cps.length.toLong
    // canonical ascending-code-point summation, same as the walk
    val slc = byCp.toSeq.sortBy(_._1)
      .map { case (_, c) => c.toDouble * math.log(c.toDouble) }.sum
    val counts = byCp.values
    val bits = java.math.BigDecimal
      .valueOf((math.log(n.toDouble) - slc / n) / math.log(2.0))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    (n, counts.size.toLong, bits)
  }

  private def walk(text: String): (Long, Long, Double) = {
    val r = CharEntropyExpr.stats(UTF8String.fromString(text))
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("walk == explode-form re-derivation on generated texts") {
    val gen = for {
      vocab <- Gen.nonEmptyListOf(Gen.oneOf('a', 'b', ' ', 'ß', '好', 'x'))
      n <- Gen.choose(1, 300)
      cs <- Gen.listOfN(n, Gen.oneOf(vocab))
      astral <- Gen.oneOf("", new String(Character.toChars(0x1F600)))
    } yield cs.mkString + astral
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1000),
      Prop.forAll(gen)(t => walk(t) == ref(t)))
    assert(res.passed, s"entropy-vs-ref: $res")
  }

  test("hand edges: single char, uniform, all-same, astral pairs") {
    for (t <- Seq("a", "ab", "aaaa", "abab", "好好x",
        new String(Character.toChars(0x1F600)) * 3 + "a"))
      assert(walk(t) == ref(t), s"input '$t'")
  }

  test("all-same text has zero entropy; uniform text has log2(k) bits") {
    assert(walk("zzzz")._3 == 0.0)
    assert(walk("abcd")._3 == 2.0)
  }
}
