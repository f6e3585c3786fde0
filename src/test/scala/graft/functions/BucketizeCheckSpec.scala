package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generative properties for both BucketizeExpr closure conventions
  * (SURVEY §2A fine print 1): the binary searches must agree with the
  * naive linear-count definitions on arbitrary sorted boundary arrays —
  * including duplicated boundaries and values exactly ON boundaries
  * (generated values are drawn from the boundary set half the time). */
class BucketizeCheckSpec extends AnyFunSuite {

  private val genCase: Gen[(Array[Double], Double, Int)] = for {
    raw <- Gen.nonEmptyListOf(Gen.chooseNum(-100, 100).map(_ / 4.0))
    bounds = raw.sorted.toArray
    onBoundary <- Gen.oneOf(true, false)
    v <- if (onBoundary) Gen.oneOf(bounds.toSeq) else Gen.chooseNum(-120.0, 120.0)
    bins <- Gen.chooseNum(1, bounds.length + 2)
  } yield (bounds, v, bins)

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: $res")
  }

  test("right-closed search == clamped strict lower-bound count") {
    check("rightClosed")(Prop.forAll(genCase) { case (bounds, v, bins) =>
      val expected = math.min(bounds.count(_ < v), bins - 1)
      BucketizeExpr.search(bounds, v, bins) == expected
    })
  }

  test("right-open search == clamped <= count (boundary-equal goes upper)") {
    check("rightOpen")(Prop.forAll(genCase) { case (bounds, v, bins) =>
      val expected = math.min(bounds.count(_ <= v), bins - 1)
      BucketizeExpr.searchRightOpen(bounds, v, bins) == expected
    })
  }

  test("conventions differ exactly on boundary-equal values") {
    check("difference")(Prop.forAll(genCase) { case (bounds, v, bins) =>
      val closed = BucketizeExpr.search(bounds, v, bins)
      val open = BucketizeExpr.searchRightOpen(bounds, v, bins)
      val eqCount = bounds.count(_ == v)
      open == math.min(closed + eqCount, bins - 1) ||
        // both clamped at the top bin
        (open == bins - 1 && closed == bins - 1)
    })
  }

  test("vector search degenerates to scalar search on width-1 keys") {
    check("vector-m1")(Prop.forAll(genCase) { case (bounds, v, _) =>
      VectorBucketizeExpr.search(bounds, 1, Array(v)) == bounds.count(_ <= v)
    })
  }
}
