package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[ShinglesExpr]] against a plain-Scala re-derivation of the declarative
  * `array_distinct(transform(sequence(...), i -> concat_ws('|',
  * slice(w, i, 3))))` form: one gram per position 1..max(len-2, 1),
  * short-document whole-list rule, duplicates dropped keeping FIRST
  * occurrence order. */
class ShinglesSpec extends AnyFunSuite {

  private def ref(ws: Seq[String]): Seq[String] = {
    val total = math.max(ws.length - 2, 1)
    (0 until total).map(i => ws.slice(i, i + 3).mkString("|")).distinct
  }

  private def walk(ws: Seq[String]): Seq[String] = {
    val arr = new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
    val out = ShinglesExpr.shingles(arr)
    (0 until out.numElements()).map(out.getUTF8String(_).toString)
  }

  private val genWords: Gen[List[String]] = for {
    vocabSize <- Gen.choose(1, 6)
    vocab <- Gen.listOfN(vocabSize, Gen.oneOf("a", "bb", "", "ccc", "naïve"))
    n <- Gen.choose(1, 40)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws

  test("walk shingles == declarative form incl. first-occurrence order") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1000),
      Prop.forAll(genWords)(ws => walk(ws) == ref(ws)))
    assert(res.passed, s"shingles-vs-ref: $res")
  }

  test("hand edges: 1 and 2 words, repetition, empty strings") {
    for (ws <- Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "c", "a", "b", "c"),
        Seq(""), Seq("", "", ""), Seq.fill(10)("x")))
      assert(walk(ws) == ref(ws), s"input $ws")
  }
}
