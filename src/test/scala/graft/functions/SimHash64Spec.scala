package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** `q_dedup_simhash`'s ground truth is the declarative formulation the
  * DuckDB oracle still runs: `split(text, ' ')` with empties kept, per-word
  * md5 hex halves parsed as unsigned 32-bit words, per-bit +1/-1 votes,
  * final bit set iff the vote sum is strictly positive. The Spark plan now
  * executes the row-local [[SimHash64Expr]] byte walk; this spec holds the
  * two together on generated corpora skewed toward the edges that differ
  * between split conventions (leading/trailing/consecutive spaces, empty
  * documents, multi-byte UTF-8 words). */
class SimHash64Spec extends AnyFunSuite {

  /** Reference: the declarative semantics re-derived in plain Scala via the
    * hex-string round-trip both engines' SQL used. */
  private def refSimhash(text: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    for (w <- text.split(" ", -1)) {
      val hex = md.digest(w.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val hHi = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val hLo = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      for (b <- 0 until 32) {
        votes(b) += (if (((hLo >> b) & 1L) == 1L) 1 else -1)
        votes(b + 32) += (if (((hHi >> b) & 1L) == 1L) 1 else -1)
      }
    }
    (0 until 64).foldLeft(0L)((h, b) => if (votes(b) > 0) h | (1L << b) else h)
  }

  private def walk(text: String): Long =
    SimHash64Expr.simhash(UTF8String.fromString(text))

  private val genText: Gen[String] = for {
    vocab <- Gen.nonEmptyListOf(Gen.oneOf(
      "the", "quick", "brown", "", "naïve", "日本語", "a", "bb", "r2d2"))
    n <- Gen.choose(0, 60)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    pre <- Gen.oneOf("", " ", "  ")
    post <- Gen.oneOf("", " ")
  } yield pre + ws.mkString(" ") + post

  test("byte walk == declarative md5-vote semantics on generated corpora") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000),
      Prop.forAll(genText)(t => walk(t) == refSimhash(t)))
    assert(res.passed, s"simhash-vs-ref: $res")
  }

  test("hand edges: empty doc, all-space doc, single word, unicode") {
    val edges = Seq("", " ", "   ", "a", "a b", " a  b ", "日本語 テスト",
      "same same same", "x " * 100)
    for (t <- edges)
      assert(walk(t) == refSimhash(t), s"input '$t'")
  }

  test("identical texts collide; the hash uses all 64 bits across a corpus") {
    assert(walk("alpha beta gamma") == walk("alpha beta gamma"))
    val hashes = (1 to 200).map(i => walk(s"doc $i word${i % 7} tail${i % 13}"))
    val orAll = hashes.reduce(_ | _)
    assert(java.lang.Long.bitCount(orAll) > 48, f"bit coverage $orAll%x")
  }
}
