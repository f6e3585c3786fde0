package graft.operators

import graft.SparkSpec

class ApproxSpec extends SparkSpec {

  test("approx sketches stay within tolerance of exact results") {
    val rows = Relational3.qApproxSketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"HLL off by >10%: approx=$approx exact=$exact")
      assert(r.getDouble(3) > 0) // approx median is positive price
      // the self-reported gates the driver reads must themselves hold
      assert(r.getBoolean(4), s"distinct_within_bound false: $r")
      assert(r.getBoolean(5), s"median_within_bound false: $r")
    }
  }
}
