package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[DocFingerprintExpr]] against a plain-Scala re-derivation of the
  * declarative explode + min(md5 hex) formulation: 5-grams joined with
  * spaces, short-document whole-list rule, minimum by hex-string order. */
class DocFingerprintSpec extends AnyFunSuite {

  private def ref(ws: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    val total = math.max(ws.length - 4, 1)
    (0 until total).map { i =>
      md.digest(ws.slice(i, i + 5).mkString(" ").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }.min
  }

  private def walk(ws: Seq[String]): String = {
    val arr = new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
    DocFingerprintExpr.fingerprint(arr).toString
  }

  private val genWords: Gen[List[String]] = for {
    vocab <- Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "", "naïve", "z9"))
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws

  test("walk fingerprint == min(md5 hex) over exploded 5-grams") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(1000),
      Prop.forAll(genWords)(ws => walk(ws) == ref(ws)))
    assert(res.passed, s"fingerprint-vs-ref: $res")
  }

  test("hand edges: short docs, repetition, empty words") {
    for (ws <- Seq(Seq("a"), Seq("a", "b", "c", "d"), Seq("a", "b", "c", "d", "e", "f"),
        Seq(""), Seq.fill(12)("same")))
      assert(walk(ws) == ref(ws), s"input $ws")
  }
}
