package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** [[ResizeBytesExpr]] against a plain-Scala re-derivation of the floor
  * block-boundary average pooling, across the payload-length edge cases
  * (empty, shorter than the output width, exact multiples, long). */
class ResizeBytesSpec extends AnyFunSuite {

  private def ref(payload: Array[Byte], outLen: Int): Seq[Double] =
    (0 until outLen).map { r =>
      val lo = (r.toLong * payload.length / outLen).toInt
      val hi = ((r + 1).toLong * payload.length / outLen).toInt
      if (hi > lo) {
        val block = payload.slice(lo, hi).map(b => (b & 0xff).toLong)
        block.sum.toDouble / block.length
      } else 0.0
    }

  private def walk(payload: Array[Byte], outLen: Int): Seq[Double] =
    ResizeBytesExpr.resize(payload, outLen).toDoubleArray().toSeq

  test("pooled lanes == reference on generated payloads") {
    val gen = for {
      n <- Gen.oneOf(Gen.choose(0, 20), Gen.choose(0, 4000))
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      outLen <- Gen.oneOf(1, 3, 8, 16)
    } yield (bytes.toArray, outLen)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen) { case (p, k) => walk(p, k) == ref(p, k) })
    assert(res.passed, s"resize-vs-ref: $res")
  }

  test("hand edges: empty, single byte, len == outLen, len == outLen - 1") {
    for (n <- Seq(0, 1, 7, 8, 9, 64); k <- Seq(1, 8)) {
      val p = Array.tabulate(n)(i => (i * 37 % 256).toByte)
      assert(walk(p, k) == ref(p, k), s"n=$n k=$k")
    }
  }

  test("outLen < 1 is rejected at ANALYSIS, not execution (round-8 advice)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    for (k <- Seq(0, -1)) {
      val check = ResizeBytesExpr(Literal(Array[Byte](1, 2)), k).checkInputDataTypes()
      assert(check.isFailure, s"outLen=$k must fail analysis")
    }
    assert(ResizeBytesExpr(Literal(Array[Byte](1, 2)), 1).checkInputDataTypes().isSuccess)
  }

  test("a short payload STRETCHES across the span (floor boundaries)") {
    // n=2, outLen=8: the only non-empty blocks are r=3 -> [0,1) and
    // r=7 -> [1,2) — the two bytes land proportionally across the output,
    // exactly how an upscaling resize places source pixels
    val out = walk(Array[Byte](10, 20), 8)
    assert(out.count(_ != 0.0) == 2 && out(3) == 10.0 && out(7) == 20.0)
  }
}
